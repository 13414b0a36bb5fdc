package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd vector kernels.
  *
  * The `aggregate(zip_with(...))` higher-order-function formulation is
  * correct but is a `CodegenFallback`: Spark evaluates the lambda
  * interpreted, per element, with boxing — measured ~100× slower than a
  * primitive loop on the 64-dim fixtures. These expressions compute the
  * same strict left-fold over `ArrayData` primitive doubles, so results
  * are bit-identical to the HOF form (and to DuckDB's `list_sum` fold —
  * the oracle contract), while participating in whole-stage codegen.
  *
  * Mirrors zvdb's `distance` (`src/hnsw.zig:182-192`): squared L2, the
  * engine's canonical metric. Unlike the reference, a length mismatch
  * returns null rather than panicking (`src/hnsw.zig:183-185`).
  *
  * Scale note: this is the innermost loop of every similarity operator;
  * at 100 TB it runs O(rows × dim) inside a codegen stage with zero
  * allocation (`toDoubleArray` on an `UnsafeArrayData` is a single
  * memcpy; the fold is a tight scalar loop the JIT vectorizes).
  */
abstract class BinaryDoubleArrayFold extends BinaryExpression {
  // Inputs must already be ARRAY<DOUBLE> — all call sites cast floats
  // to double up front (Tables.embeddings), which is also what the
  // DuckDB-oracle parity contract requires. ENFORCED at analysis time:
  // an ARRAY<FLOAT> slipping through is not a type error at runtime —
  // UnsafeArrayData.toDoubleArray bulk-reinterprets the 4-byte packed
  // floats as 8-byte doubles and the fold returns garbage ~1e-12
  // "distances" (observed: a spec passing the raw float embedding
  // column got plausible-looking near-zero results, the silent-wrong
  // failure mode). Fail the query instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> arguments (cast " +
          s"ARRAY<FLOAT> explicitly), got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Do the input ARRAY TYPES admit null elements? When neither does,
    * the per-element null probes compile away entirely; when one does,
    * a null element NULL-PROPAGATES exactly like the HOF form
    * (`aggregate` turns the accumulator null at the first null and it
    * stays null) and DuckDB's `list_sum` — reading a null slot as 0.0
    * would be a silent verdict flip against both. The probe is a null-
    * word bit test independent of the FP accumulate chain, so it
    * pipelines for ~free even when emitted. */
  protected lazy val elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  /** The per-element / accumulate step as Java source for codegen;
    * `%acc`, `%x`, `%y` are substituted. */
  protected def stepJava(acc: String, x: String, y: String): String
  protected def step(acc: Double, x: Double, y: Double): Double

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (xs.isNullAt(i) || ys.isNullAt(i))) return null
      acc = step(acc, xs.getDouble(i), ys.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val nullEl = ctx.freshName("nullEl")
    // null-element probe emitted ONLY when the array types admit null
    // elements — see [[elementsNullable]] for the propagation contract
    val nullProbe =
      if (elementsNullable)
        s"if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) { $nullEl = true; break; }"
      else ""
    // direct getDouble reads, NO toDoubleArray: the fold runs per
    // joined PAIR in the ε-join / k-NN hot paths, and materializing
    // both sides costs two array allocations + bulk copies per pair —
    // measured 2x the fold itself on the sf1 exact pair stage.
    // UnsafeArrayData.getDouble is a direct word read; results are
    // bit-identical (same values, same strict left-to-right order).
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if ($n == ${rightGen.value}.numElements()) {
            double $acc = 0.0;
            boolean $nullEl = false;
            for (int $i = 0; $i < $n; $i++) {
              $nullProbe
              ${stepJava(acc, s"${leftGen.value}.getDouble($i)",
                s"${rightGen.value}.getDouble($i)")}
            }
            if (!$nullEl) {
              ${ev.isNull} = false;
              ${ev.value} = $acc;
            }
          }
        }
      """
    ev.copy(code = code)
  }
}

/** Squared Euclidean distance: fold of (x-y)^2, strict left-to-right. */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryDoubleArrayFold {
  override def prettyName: String = "squared_l2"
  override protected def step(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  // brace-scoped: whole-stage codegen may inline several fold bodies
  // into one generated method, and an unscoped `d` would collide
  override protected def stepJava(acc: String, x: String, y: String): String =
    s"{ double d = $x - $y; $acc += d * d; }"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused ε-ball predicate: `squared_l2(left, right) < eps` with EARLY
  * EXIT once the running sum crosses `eps`. Verdict-IDENTICAL to the
  * unfused `SquaredL2Distance(...) < eps` form: every term (x−y)² is
  * ≥ 0 and IEEE round-to-nearest addition of a non-negative term is
  * monotone non-decreasing (the rounded sum never drops below the
  * previous partial), so a partial sum ≥ eps proves the full strict
  * left fold is ≥ eps — no pair can change sides. Null/length-mismatch
  * semantics match the unfused form (null, which a Filter drops), and
  * NaN does too: the exit tests `!(acc < eps)`, so the first NaN
  * partial returns false — exactly the unfused `NaN < eps`, since the
  * unfused form computes the SAME strict left fold and NaN partials
  * propagate to a NaN total.
  *
  * Why it exists: the ε-joins (exact sampled pair stage of the dedup
  * chooser, probes×occupants verdict joins, cell pair stages) evaluate
  * millions of 64–128-dim distances whose RESULT is only compared to a
  * small ε; with eps=1.1 against typical inter-point distances of
  * 10–40, the sum crosses ε within a few terms and the fused predicate
  * skips the rest of the row — the oracle SQL is unchanged because the
  * boolean is the same function of the inputs. */
case class SquaredL2Within(left: Expression, right: Expression, eps: Double)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> arguments (cast " +
          s"ARRAY<FLOAT> explicitly), got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "squared_l2_within"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    // direct getDouble reads, mirroring the generated code — the
    // interpreted path (codegen fallback, constant folding) must not
    // pay the two toDoubleArray copies the fusion exists to avoid.
    // n = 0 leaves the loop unentered: the answer is 0.0 < eps
    val elNullable =
      left.dataType.asInstanceOf[ArrayType].containsNull ||
        right.dataType.asInstanceOf[ArrayType].containsNull
    var within = 0.0 < eps
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element NULL-PROPAGATES like the unfused form (whose
      // fold goes null and `null < eps` is null) — including PAST the
      // early exit: an exit taken before a later null element would
      // otherwise report false where the unfused form says null
      // (identical under a plain Filter, divergent under NOT or when
      // projected), so the exit path null-scans the unvisited tail.
      // The scan costs only on nullable-element arrays that exit
      // early; the declared vector columns are non-nullable, where
      // elNullable is false and both probes vanish.
      if (elNullable && (xs.isNullAt(i) || ys.isNullAt(i))) return null
      val d = xs.getDouble(i) - ys.getDouble(i); acc += d * d
      // !(acc < eps), NOT acc >= eps: both are identical for finite
      // sums, but a NaN partial (NaN input, or Inf−Inf) must exit
      // FALSE — the unfused `squared_l2 < eps` computes the same
      // strict left fold, whose NaN propagates to a NaN total, and
      // `NaN < eps` is false. `NaN >= eps` is ALSO false, so the
      // >= form would keep looping and return true for NaN pairs.
      if (!(acc < eps)) {
        if (elNullable) {
          var j = i + 1
          while (j < n) {
            if (xs.isNullAt(j) || ys.isNullAt(j)) return null
            j += 1
          }
        }
        within = false; i = n
      } else { within = true; i += 1 }
    }
    within
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val within = ctx.freshName("within")
    val nullEl = ctx.freshName("nullEl")
    val elNullable =
      left.dataType.asInstanceOf[ArrayType].containsNull ||
        right.dataType.asInstanceOf[ArrayType].containsNull
    // null-element probe only when the types admit one — see eval
    val nullProbe =
      if (elNullable)
        s"if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) { $nullEl = true; break; }"
      else ""
    // the early exit must not mask a null element later in the row
    // (unfused form: the whole fold is null) — scan the unvisited
    // tail before reporting false; compiled away on non-nullable
    // arrays, so the declared hot path pays nothing
    val tailNullScan =
      if (elNullable)
        s"""for (int ${i}t = $i + 1; ${i}t < $n; ${i}t++) {
           |  if (${leftGen.value}.isNullAt(${i}t) || ${rightGen.value}.isNullAt(${i}t)) { $nullEl = true; break; }
           |}""".stripMargin
      else ""
    // Double.toString round-trips every FINITE eps exactly; the
    // non-finite values stringify to Java-uncompilable literals
    // ("InfinityD"/"NaND"), which would fail Janino and silently drop
    // the whole stage to interpreted execution — name their constants
    val epsLit =
      if (java.lang.Double.isNaN(eps)) "Double.NaN"
      else if (eps == Double.PositiveInfinity) "Double.POSITIVE_INFINITY"
      else if (eps == Double.NegativeInfinity) "Double.NEGATIVE_INFINITY"
      else s"${java.lang.Double.toString(eps)}D"
    // direct getDouble reads, NO toDoubleArray: the ε-filter hot loop
    // runs per PAIR, and materializing both sides first costs two
    // array allocations + copies per pair AND defeats the early exit
    // (the copy reads every element the exit exists to skip)
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        boolean ${ev.value} = false;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = ${leftGen.value}.numElements();
          if ($n == ${rightGen.value}.numElements()) {
            boolean $within = 0.0 < $epsLit;
            double $acc = 0.0;
            boolean $nullEl = false;
            for (int $i = 0; $i < $n; $i++) {
              $nullProbe
              { double d = ${leftGen.value}.getDouble($i) - ${rightGen.value}.getDouble($i);
                $acc += d * d; }
              // !(acc < eps): identical to >= for finite sums, but a
              // NaN partial must exit FALSE like the unfused NaN < eps
              if (!($acc < $epsLit)) { $tailNullScan $within = false; break; }
              $within = true;
            }
            if (!$nullEl) {
              ${ev.isNull} = false;
              ${ev.value} = $within;
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product: fold of x*y, strict left-to-right. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryDoubleArrayFold {
  override def prettyName: String = "dot_product"
  override protected def step(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def stepJava(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `bits`-wide SimHash (Charikar) over an ARRAY<BIGINT> of element
  * hashes: per bit b ∈ [0,bits), vote +1/−1 by bit b of each hash;
  * output packs votes>0 as bits, bit 0 most significant (matches the
  * `aggregate(transform(sequence(0,bits-1),...))` HOF spec and the
  * DuckDB `list_reduce` oracle bit-for-bit). At bits=64 the top vote
  * bit lands in the sign position — the packed value is the two's
  * complement reinterpretation, which xor/bit_count Hamming arithmetic
  * is oblivious to on both engines.
  *
  * One pass over the array instead of `bits` interpreted lambda folds —
  * the HOF form measured ~0.5 s/doc interpreted; this is O(len·bits)
  * primitive ops inside codegen.
  */
case class SimHash(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 64, s"simhash width must be in [1,64], got $bits")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = s"simhash$bits"

  // Same analysis-time guard as BinaryDoubleArrayFold: getLong(i) over
  // an UnsafeArrayData of narrower elements reads off-stride garbage
  // rather than failing — require ARRAY<BIGINT> up front.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<BIGINT> argument, got ${t.simpleString}")
  }

  /** Null elements NULL-PROPAGATE (the HOF `aggregate` spec this
    * expression documents bit-parity with, and DuckDB's `list_reduce`,
    * both go null) — reading a null slot as 0L would cast a silent
    * all-bits -1 vote instead. Probed only when the type admits one. */
  private lazy val elementsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (elementsNullable && arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) { out = out * 2 + (if (votes(b) > 0) 1L else 0L); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val nullProbe =
        if (elementsNullable)
          s"if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
        int[] $votes = new int[$bits];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          $nullProbe
          long $h = $arr.getLong($i);
          for (int $b = 0; $b < $bits; $b++) {
            if ((($h >> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
          }
        }
        if (!${ev.isNull}) {
          long $out = 0L;
          for (int $b = 0; $b < $bits; $b++) { $out = $out * 2 + ($votes[$b] > 0 ? 1L : 0L); }
          ${ev.value} = $out;
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Back-compat constructor for the canonical 48-bit form. */
object SimHash48 {
  def apply(child: Expression): SimHash = SimHash(child, 48)
}
