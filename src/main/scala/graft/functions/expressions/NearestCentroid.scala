package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row argmin over a broadcast centroid array — the MAP-ONLY form
  * of every Lloyd/IVF/nearest-centroid assignment.
  *
  * The previous shape at every assignment site was
  *
  *   corpus ⨯ broadcast(centroids)              (k rows per vector)
  *     → groupBy(vec_id).agg(min(struct(dist, label)))
  *
  * which partial-aggregates map-side but still hash-partitions the
  * corpus by `vec_id` — one full corpus-sized Exchange per assignment
  * (and per Lloyd ROUND in `kmeans_iter`, carrying the embedding
  * payload through `first(embedding)`). The argmin of one row against
  * a small codebook needs no cross-row state at all: fold the codebook
  * into ONE array-typed row (`collect_list` of k rows), broadcast that,
  * and evaluate the argmin per corpus row inside the scan's codegen
  * stage. Exchange count for an assignment drops from 1 to 0; at
  * 100 TB that is the difference between a map pass and shuffling the
  * corpus once per Lloyd round (guide §2.4 — remove shuffles outright).
  *
  * BIT-IDENTICAL to the aggregate form, by construction:
  *   - each distance is the same strict left fold as
  *     [[SquaredL2Distance]] (same index order → same IEEE rounding);
  *   - the comparison `d < best || (d == best && label < bestLabel)`
  *     is exactly `min(struct(dist, label))`'s lexicographic order on
  *     non-NaN inputs. A squared-L2 fold cannot produce NaN from the
  *     finite fixture values, and cannot produce −0.0 at all (each
  *     term (x−y)² is +0.0 or positive, and +0.0 + +0.0 = +0.0), so
  *     the IEEE `<`/`==` comparison and the total order agree.
  *
  * Inputs: left = ARRAY<DOUBLE> (the vector); right =
  * ARRAY<STRUCT<label INT|BIGINT, cvec ARRAY<DOUBLE>>> (the codebook —
  * any order; ties resolve by label, not position). Output:
  * STRUCT<dist DOUBLE, label sametype>. Null vector / null codebook /
  * empty codebook / a codeword of mismatched length → null, the
  * null-propagation of the joined form's null distances.
  *
  * Evaluated once per corpus row inside whole-stage codegen: k·dim
  * fused multiply-adds, no allocation (direct `getDouble` reads — the
  * [[BinaryDoubleArrayFold]] treatment).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "nearest_centroid"

  private def centTypes: Option[(DataType, Boolean)] = right.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, lt @ (IntegerType | LongType), _, _),
        StructField(_, ArrayType(DoubleType, cn), _, _))), _) =>
      Some((lt, cn))
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, centTypes) match {
      case (ArrayType(DoubleType, _), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<STRUCT<label INT|BIGINT, " +
          s"cvec ARRAY<DOUBLE>>>), got ${l.simpleString} and " +
          s"${right.dataType.simpleString(60)}")
    }

  private lazy val labelType: DataType = centTypes.get._1

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("label", labelType, nullable = false)))
  override def nullable: Boolean = true

  /** Null probes compile away when neither array type admits null
    * elements (the [[BinaryDoubleArrayFold]] contract): a null element
    * null-propagates the whole result, like the joined form whose null
    * distance rows poison the struct-min. */
  private lazy val vecElemNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val centElemNullable: Boolean = {
    val at = right.dataType.asInstanceOf[ArrayType]
    at.containsNull || centTypes.get._2
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val cs = right.eval(input)
    if (cs == null) return null
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val k = cents.numElements()
    if (k == 0) return null
    var bestD = 0.0
    var bestL = 0L
    var found = false
    var c = 0
    while (c < k) {
      if (centElemNullable && cents.isNullAt(c)) return null
      val ce = cents.getStruct(c, 2)
      val lab = labelType match {
        case IntegerType => ce.getInt(0).toLong
        case _           => ce.getLong(0)
      }
      val cv = ce.getArray(1)
      if (cv.numElements() != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if ((vecElemNullable && vec.isNullAt(i)) ||
            (centElemNullable && cv.isNullAt(i))) return null
        val d = vec.getDouble(i) - cv.getDouble(i)
        acc += d * d
        i += 1
      }
      if (!found || acc < bestD || (acc == bestD && lab < bestL)) {
        found = true; bestD = acc; bestL = lab
      }
      c += 1
    }
    labelType match {
      case IntegerType => InternalRow(bestD, bestL.toInt)
      case _           => InternalRow(bestD, bestL)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val (labJava, labGetter) = labelType match {
      case IntegerType => ("int", "getInt")
      case _           => ("long", "getLong")
    }
    val n = ctx.freshName("n")
    val k = ctx.freshName("k")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val ce = ctx.freshName("ce")
    val cv = ctx.freshName("cv")
    val lab = ctx.freshName("lab")
    val bestD = ctx.freshName("bestD")
    val bestL = ctx.freshName("bestL")
    val found = ctx.freshName("found")
    val bad = ctx.freshName("bad")
    val rowClass = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
    val centNullProbe =
      if (centElemNullable)
        s"if (${rightGen.value}.isNullAt($c)) { $bad = true; break; }"
      else ""
    val elemNullProbe = {
      val probes = Seq(
        if (vecElemNullable) Some(s"${leftGen.value}.isNullAt($i)") else None,
        if (centElemNullable) Some(s"$cv.isNullAt($i)") else None).flatten
      if (probes.isEmpty) ""
      else s"if (${probes.mkString(" || ")}) { $bad = true; break; }"
    }
    val innerBreakGuard = if (elemNullProbe.nonEmpty) s"if ($bad) break;" else ""
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          int $n = ${leftGen.value}.numElements();
          int $k = ${rightGen.value}.numElements();
          double $bestD = 0.0;
          $labJava $bestL = 0;
          boolean $found = false;
          boolean $bad = ($k == 0);
          for (int $c = 0; $c < $k; $c++) {
            $centNullProbe
            InternalRow $ce = ${rightGen.value}.getStruct($c, 2);
            $labJava $lab = $ce.$labGetter(0);
            org.apache.spark.sql.catalyst.util.ArrayData $cv = $ce.getArray(1);
            if ($cv.numElements() != $n) { $bad = true; break; }
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $elemNullProbe
              { double d = ${leftGen.value}.getDouble($i) - $cv.getDouble($i);
                $acc += d * d; }
            }
            $innerBreakGuard
            if (!$found || $acc < $bestD || ($acc == $bestD && $lab < $bestL)) {
              $found = true; $bestD = $acc; $bestL = $lab;
            }
          }
          if (!$bad && $found) {
            ${ev.isNull} = false;
            ${ev.value} = new $rowClass(new Object[] {
              (Object) $bestD, (Object) $bestL });
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
