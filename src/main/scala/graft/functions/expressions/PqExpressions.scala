package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen'd kernels of the quantized serving arms — the
  * per-corpus-row hot loops that previously ran as interpreted
  * higher-order-function lambdas (`aggregate(sequence(...), ...)` is a
  * CodegenFallback evaluated per element with boxing) or as
  * corpus-sized aggregate exchanges. Each is documented against the
  * exact HOF/aggregate form it replaces and is BIT-IDENTICAL to it:
  * same strict left folds, same (dist, code) lexicographic argmin tie
  * order (see [[NearestCentroid]]'s −0.0/NaN impossibility argument —
  * squared-L2 partial sums of finite inputs are non-negative and never
  * −0.0, so IEEE `<`/`==` agree with the struct-min total order).
  */

/** All `subs` PQ sub-codes of one vector in one pass — the map-only
  * replacement for the per-(vec, sub) argmin aggregate
  * (`explode(slices) ⨯ broadcast(cb) → groupBy(vec_id, sub)
  * .agg(min(struct(cd, code)))` shuffled the corpus once — ×2 with the
  * `collect_list` re-assembly the serving arms then paid to get the
  * codes array back).
  *
  * `cb` is the flattened codebook ARRAY<STRUCT<sub INT, code INT,
  * cw ARRAY<DOUBLE>>> sorted by (sub, code) (the call sites build it
  * with `sort_array(collect_list(...))`), `subs`×`k` entries of
  * `subDim`-wide codewords. Output: ARRAY<INT> of length `subs`,
  * element s = argmin by (squaredL2(vec[s·subDim ..], cw), code) over
  * the k codewords of subspace s — each distance the same strict left
  * fold as `squaredL2(slice(vec, s·subDim+1, subDim), cw)`.
  *
  * Null vector / null codebook, a codebook not sized subs·k, an entry
  * out of (sub, code) order, or a codeword/vector length mismatch →
  * null (the joined form's null-distance poisoning; unreachable on the
  * declared corpora, where the codebook is validated up front). */
case class PqEncode(left: Expression, right: Expression,
                    subs: Int, subDim: Int) extends BinaryExpression {
  require(subs >= 1 && subDim >= 1)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(StructType(Array(
          StructField(_, IntegerType, _, _),
          StructField(_, IntegerType, _, _),
          StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<STRUCT<sub INT, code INT, " +
          s"cw ARRAY<DOUBLE>>>), got ${l.simpleString} and ${r.simpleString(60)}")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val cs = right.eval(input)
    if (cs == null) return null
    val vec = v.asInstanceOf[ArrayData]
    val cb = cs.asInstanceOf[ArrayData]
    if (vec.numElements() < subs * subDim) return null
    val k = cb.numElements() / subs
    if (k == 0 || k * subs != cb.numElements()) return null
    val out = new Array[Int](subs)
    var s = 0
    while (s < subs) {
      var bestD = 0.0
      var bestC = 0
      var found = false
      var j = 0
      while (j < k) {
        val ce = cb.getStruct(s * k + j, 3)
        if (ce.getInt(0) != s) return null
        val code = ce.getInt(1)
        val cw = ce.getArray(2)
        if (cw.numElements() != subDim) return null
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = vec.getDouble(s * subDim + i) - cw.getDouble(i)
          acc += d * d
          i += 1
        }
        if (!found || acc < bestD || (acc == bestD && code < bestC)) {
          found = true; bestD = acc; bestC = code
        }
        j += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val vec = leftGen.value
    val cb = rightGen.value
    val k = ctx.freshName("k")
    val s = ctx.freshName("s")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val ce = ctx.freshName("ce")
    val cw = ctx.freshName("cw")
    val code = ctx.freshName("code")
    val bestD = ctx.freshName("bestD")
    val bestC = ctx.freshName("bestC")
    val found = ctx.freshName("found")
    val bad = ctx.freshName("bad")
    val out = ctx.freshName("out")
    val gadClass = classOf[GenericArrayData].getName
    val code0 =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        ArrayData ${ev.value} = null;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $k = ${cb}.numElements() / $subs;
          boolean $bad = ${vec}.numElements() < ${subs * subDim} ||
            $k == 0 || $k * $subs != ${cb}.numElements();
          int[] $out = new int[$subs];
          for (int $s = 0; !$bad && $s < $subs; $s++) {
            double $bestD = 0.0;
            int $bestC = 0;
            boolean $found = false;
            for (int $j = 0; $j < $k; $j++) {
              InternalRow $ce = ${cb}.getStruct($s * $k + $j, 3);
              if ($ce.getInt(0) != $s) { $bad = true; break; }
              int $code = $ce.getInt(1);
              org.apache.spark.sql.catalyst.util.ArrayData $cw = $ce.getArray(2);
              if ($cw.numElements() != $subDim) { $bad = true; break; }
              double $acc = 0.0;
              for (int $i = 0; $i < $subDim; $i++) {
                double d = ${vec}.getDouble($s * $subDim + $i) - $cw.getDouble($i);
                $acc += d * d;
              }
              if (!$found || $acc < $bestD || ($acc == $bestD && $code < $bestC)) {
                $found = true; $bestD = $acc; $bestC = $code;
              }
            }
            $out[$s] = $bestC;
          }
          if (!$bad) {
            ${ev.isNull} = false;
            ${ev.value} = new $gadClass($out);
          }
        }
      """
    ev.copy(code = code0)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The ADC lookup sum — `Σ_s lut[s·k + codes[s]]` as a strict left
  * fold over s, the native form of
  * `aggregate(sequence(1, subs), 0D, (acc, s) -> acc +
  *   element_at(lut, (s-1)·k + element_at(codes, s) + 1))`
  * which ran as an interpreted lambda (plus two boxed `element_at`s)
  * per (corpus row × query) in the PQ/IVFPQ shortlist scans — the
  * hottest per-row loop of both arms. Identical values: the fold
  * visits s in the same order and each term is the same double read.
  * Null codes/lut or an out-of-range index → null (the non-ANSI
  * `element_at` behavior; indexes are in range by construction — codes
  * are 0..k−1 and the LUT is subs·k wide). */
case class AdcDist(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1)
  override def prettyName: String = "adc_dist"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<INT> codes, ARRAY<DOUBLE> lut), " +
          s"got ${l.simpleString} and ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val codesNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val lutNullable: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def eval(input: InternalRow): Any = {
    val c = left.eval(input)
    if (c == null) return null
    val l = right.eval(input)
    if (l == null) return null
    val codes = c.asInstanceOf[ArrayData]
    val lut = l.asInstanceOf[ArrayData]
    val subs = codes.numElements()
    val n = lut.numElements()
    var acc = 0.0
    var s = 0
    while (s < subs) {
      if (codesNullable && codes.isNullAt(s)) return null
      val idx = s * k + codes.getInt(s)
      if (idx < 0 || idx >= n) return null
      if (lutNullable && lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val subs = ctx.freshName("subs")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val idx = ctx.freshName("idx")
    val acc = ctx.freshName("acc")
    val bad = ctx.freshName("bad")
    val codesNullProbe =
      if (codesNullable)
        s"if (${leftGen.value}.isNullAt($s)) { $bad = true; break; }"
      else ""
    val lutNullProbe =
      if (lutNullable)
        s"if (${rightGen.value}.isNullAt($idx)) { $bad = true; break; }"
      else ""
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $subs = ${leftGen.value}.numElements();
          int $n = ${rightGen.value}.numElements();
          double $acc = 0.0;
          boolean $bad = false;
          for (int $s = 0; $s < $subs; $s++) {
            $codesNullProbe
            int $idx = $s * $k + ${leftGen.value}.getInt($s);
            if ($idx < 0 || $idx >= $n) { $bad = true; break; }
            $lutNullProbe
            $acc += ${rightGen.value}.getDouble($idx);
          }
          if (!$bad) {
            ${ev.isNull} = false;
            ${ev.value} = $acc;
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Packed sign bits of elements `lo..hi` (1-based, inclusive) — the
  * native form of
  * `aggregate(sequence(lo, hi), 0L, (acc, i) -> acc * 2L +
  *   CASE WHEN element_at(vec, i) > 0D THEN 1L ELSE 0L END)`
  * which ran as an interpreted per-element lambda over every corpus
  * row in `bq_codes`. Identical values, including the HOF's null
  * semantics: a NULL ELEMENT contributes bit 0 (the CASE's `null > 0`
  * is null → ELSE), it does NOT null-propagate; a null vector → null.
  * An index beyond the array also contributes 0, matching the
  * non-ANSI `element_at` (declared vectors are fixed 64-wide, so
  * neither case is reachable on the gated corpora). */
case class SignBits(child: Expression, lo: Int, hi: Int)
    extends UnaryExpression {
  require(lo >= 1 && hi >= lo && hi - lo < 64)
  override def prettyName: String = s"sign_bits_${lo}_$hi"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val elementsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var acc = 0L
    var i = lo - 1
    while (i < hi) {
      val bit =
        if (i >= n || (elementsNullable && vec.isNullAt(i))) 0L
        else if (vec.getDouble(i) > 0.0) 1L
        else 0L
      acc = acc * 2L + bit
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullBit =
        if (elementsNullable) s" && !$vec.isNullAt($i)" else ""
      s"""
        int $n = $vec.numElements();
        long $acc = 0L;
        for (int $i = ${lo - 1}; $i < $hi; $i++) {
          long bit = ($i < $n$nullBit && $vec.getDouble($i) > 0.0) ? 1L : 0L;
          $acc = $acc * 2L + bit;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
