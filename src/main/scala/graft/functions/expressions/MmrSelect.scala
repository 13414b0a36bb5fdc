package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy MMR (maximal marginal relevance) selection over one query's
  * candidate list — the whole k-round recurrence of
  * [[graft.operators.Ann.mmrRerank]] evaluated once per query group,
  * replacing the per-round DataFrame loop (k−1 rounds × {anti-join,
  * penalty join + min aggregate, argmin aggregate} + a lazy checkpoint
  * per round — ~30 operators and 9 sequential plan roots for k=10)
  * with ONE expression eval. At 100 TB the candidate pool is
  * query-sized by construction (top-`cand` of the initial exact scan),
  * so the group this runs on is ≤ `cand` rows regardless of corpus
  * size; the DataFrame rounds moved the same tiny data k times with a
  * full scheduling round-trip each.
  *
  * Semantics, BIT-IDENTICAL to the unrolled form (and the oracle's
  * SQL unroll):
  *   - round 1 picks argmin by (dist, vec_id) — `min(struct(dist, id))`;
  *   - round r picks, among unselected candidates, argmin by
  *     (dist − μ · minpd, vec_id) where minpd = min over selected j of
  *     squaredL2(cand, j) — each pairwise distance the same strict
  *     left fold as [[SquaredL2Distance]], the min over selected a
  *     plain IEEE min (order-insensitive on non-NaN), and the score
  *     arithmetic the same two double ops. minpd is maintained
  *     incrementally (min(prev, pd(i, j_new))) — associativity of min
  *     makes that the identical value to re-aggregating per round;
  *   - stops after `k` picks or when candidates run out (fewer than k
  *     candidates select them all, the unrolled form's empty-round
  *     behavior).
  *
  * Input: ARRAY<STRUCT<dist DOUBLE, vec_id BIGINT, emb ARRAY<DOUBLE>>>
  * (any order — selection scans all rows; call sites sort for plan
  * determinism). Output: ARRAY<BIGINT> of selected vec_ids in pick
  * order (rnk = position + 1).
  *
  * Evaluated once per query group (never per row/pair), so
  * CodegenFallback costs nothing measurable — the [[DiversitySelect]]
  * precedent. */
case class MmrSelect(child: Expression, k: Int, mu: Double)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"mmr_select requires k >= 1, got $k")
  override def prettyName: String = "mmr_select"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, DoubleType, _, _),
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRUCT<dist DOUBLE, vec_id BIGINT, " +
        s"emb ARRAY<DOUBLE>>>, got ${t.simpleString(40)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val dists = new Array[Double](n)
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      dists(i) = row.getDouble(0)
      ids(i) = row.getLong(1)
      vecs(i) = row.getArray(2).toDoubleArray()
      i += 1
    }
    val taken = new Array[Boolean](n)
    // minpd(i) = min squared-L2 from candidate i to any selected id,
    // maintained incrementally as picks land (≡ the per-round min
    // aggregate: min is associative and commutative on non-NaN)
    val minpd = Array.fill(n)(Double.NaN) // NaN = "no selected yet"
    val picks = math.min(k, n)
    val out = new Array[Long](picks)
    var np = 0
    while (np < picks) {
      var best = -1
      var bestScore = 0.0
      var bestId = 0L
      i = 0
      while (i < n) {
        if (!taken(i)) {
          // round 1: plain (dist, id); later rounds: (dist − μ·minpd, id)
          val score =
            if (np == 0) dists(i) else dists(i) - mu * minpd(i)
          if (best < 0 || score < bestScore ||
              (score == bestScore && ids(i) < bestId)) {
            best = i; bestScore = score; bestId = ids(i)
          }
        }
        i += 1
      }
      taken(best) = true
      out(np) = ids(best)
      np += 1
      if (np < picks) {
        // fold the new pick into every unselected candidate's minpd
        val pv = vecs(best)
        i = 0
        while (i < n) {
          if (!taken(i)) {
            val cv = vecs(i)
            var acc = 0.0
            var x = 0
            while (x < cv.length) {
              val dd = cv(x) - pv(x); acc += dd * dd; x += 1
            }
            if (minpd(i).isNaN || acc < minpd(i)) minpd(i) = acc
          }
          i += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
