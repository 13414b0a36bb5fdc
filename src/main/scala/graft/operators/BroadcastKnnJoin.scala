package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Broadcast exact k-NN join — the workhorse physical operator behind
  * every exact similarity query.
  *
  * Computes, for each query vector in `queries` (small side), its k
  * nearest corpus vectors (large side) under squared L2
  * (`src/hnsw.zig:182-192`), ties broken on corpus id.
  *
  * Physical design (and why not a relational cross join):
  * a `crossJoin` + window materializes |corpus|×|queries| join rows
  * (with both embedding arrays copied into each) before pruning to k —
  * measured ~136 µs/pair of pure overhead in the non-codegen
  * BroadcastNestedLoopJoin stage. This operator instead:
  *
  *   1. broadcasts the query set as primitive `Array[Double]`s
  *      (Q × dim × 8 bytes — the same "small side fits in memory"
  *      contract as any broadcast hash join);
  *   2. streams each corpus partition once, evaluating distances in a
  *      tight JIT-friendly primitive loop and maintaining one bounded
  *      (dist, id) max-heap of size k per query — mirroring the
  *      reference's priority-queue search (`src/hnsw.zig:202-224`)
  *      but per-partition and lock-free (shared-nothing inverts the
  *      reference's global-mutex design, `benchmarks/benchmark.md:1-8`);
  *   3. emits only P×Q×k candidate rows, merged to the global top-k
  *      with a window — a shuffle of k·Q·P tiny rows, independent of
  *      corpus size.
  *
  * Scale: the corpus is read exactly once, never shuffled, never
  * collected; memory per task is O(Q·k). At 100 TB this is a pure map
  * stage over the table plus a merge of a few MB. For query sets too
  * large to broadcast, use the LSH-bucketed path ([[Ann]]).
  *
  * Determinism: the per-pair fold is left-to-right over the array, so
  * distances are bit-identical to the declarative
  * `aggregate(zip_with(...))` form and to DuckDB's `list_sum` — the
  * oracle contract. Selection by (dist, id) is a total order, so the
  * result is independent of partitioning.
  */
object BroadcastKnnJoin {

  /** Exact squared-L2 top-k for each query.
    *
    * @param corpus  DataFrame with columns (idCol: LONG, vecCol: ARRAY<DOUBLE>)
    * @param queries DataFrame with columns (idCol: LONG, vecCol: ARRAY<DOUBLE>)
    * @param k       neighbors per query
    * @param excludeSelf skip corpus row whose id equals the query id
    *                    (for self-join k-NN-graph builds)
    * @return (query_id, vec_id, dist, rnk) with rnk in 1..k ascending
    *         by (dist, vec_id)
    */
  def apply(
      spark: SparkSession,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeSelf: Boolean = false): DataFrame = {
    import spark.implicits._

    val qs: Array[(Long, Array[Double])] =
      queries.select(col(idCol), col(vecCol)).as[(Long, Array[Double])]
        .collect().sortBy(_._1)
    val bq = spark.sparkContext.broadcast(qs)
    val kk = k
    val skipSelf = excludeSelf

    // Ensure the probe side has at least one partition per core: the
    // local fixtures are single-split parquet files (1 partition → 1
    // task → the whole O(|corpus|·Q) compute on one core). The guard
    // keeps this a no-op on genuinely multi-split tables, where a
    // repartition would be an unnecessary full shuffle.
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val probeRaw = corpus.select(col(idCol), col(vecCol))
    // toRdd reuses the analyzed plan's physical RDD lineage without the
    // extra row-deserializer stage that `.rdd` would build per call.
    val probe =
      if (probeRaw.queryExecution.toRdd.getNumPartitions < p) probeRaw.repartition(p)
      else probeRaw

    val partialTopK = probe
      .as[(Long, Array[Double])]
      .mapPartitions { iter =>
        val queries = bq.value
        val nq = queries.length
        // one bounded max-heap (worst-first) of (dist, id) per query
        val heaps = Array.fill(nq)(new BoundedTopK(kk))
        while (iter.hasNext) {
          val (id, vec) = iter.next()
          var qi = 0
          while (qi < nq) {
            val (qid, qv) = queries(qi)
            if (!(skipSelf && qid == id)) {
              // PLAIN fold — the heap-bound early abandon was measured
              // a pessimization here (see BlockKnnJoin.knnGraph note:
              // the crossing lands mid-fold, and the per-iteration
              // branch costs more than the skipped arithmetic); offer()
              // is the arbiter and admits a NaN distance NaN-last like
              // the SQL rank
              heaps(qi).offer(BlockKnnJoin.sqDist(vec, qv), id)
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          val qid = queries(qi)._1
          h.drain().map { case (dist, id) => (qid, id, dist) }
        }
      }
      .toDF("query_id", idCol, "dist")

    val w = Window.partitionBy("query_id").orderBy(col("dist"), col(idCol))
    partialTopK
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kk)
  }

}

/** Bounded top-k selector over (dist, id) with (dist, id) total order —
  * smallest k kept, worst element evicted first. Binary max-heap on
  * primitive arrays; O(log k) offer when full, O(1) reject.
  */
final class BoundedTopK(k: Int) extends Serializable {
  private val dists = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var size = 0

  // Total order via Double.compare, NOT raw > : a NaN distance (NaN
  // input vector, or Inf−Inf) must order LAST, exactly as Spark SQL's
  // ORDER BY and DuckDB rank it — raw `NaN > x` is false both ways,
  // which made NaN un-evictable once admitted and silently dropped
  // under early-abandon. Double.compare puts NaN above +Inf. (Its
  // −0.0 < 0.0 quirk is unreachable here: squared distances are sums
  // of IEEE squares, which are never −0.0.)
  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c > 0 || (c == 0 && i1 > i2)
  }

  /** Current admission bound: a candidate whose distance is STRICTLY
    * above this can never enter the heap (when full, the root's dist).
    * Equality is not prunable — (dist, id) ties are decided by id — so
    * early-abandon callers must keep accumulating at acc == bound.
    * k = 0 admits nothing, so its bound is −∞ (offer() is the final
    * arbiter either way; the bound only licenses abandoning). */
  def bound: Double =
    if (k == 0) Double.NegativeInfinity
    else if (size < k) Double.PositiveInfinity
    else dists(0)

  def offer(d: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      dists(i) = d; ids(i) = id; size += 1
      // sift up
      while (i > 0 && worse(dists(i), ids(i), dists((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (k > 0 && worse(dists(0), ids(0), d, id)) {
      dists(0) = d; ids(0) = id
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val td = dists(a); dists(a) = dists(b); dists(b) = td
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var continue = true
    while (continue) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
      if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
      if (m != i) { swap(i, m); i = m } else continue = false
    }
  }

  /** Contents ascending by (dist, id) written into the primitive
    * (dist, id) slices at [off, off+size); empties the heap; returns
    * the count written. Allocation-free twin of [[drain]] for hot
    * merge paths (the baseline scan packs Q×k results per task — the
    * tuple boxing of drain() was measurable GC churn there). */
  def drainInto(dOut: Array[Double], iOut: Array[Long], off: Int): Int = {
    val n = size
    var i = n - 1
    while (i >= 0) {
      dOut(off + i) = dists(0); iOut(off + i) = ids(0)
      size -= 1
      if (size > 0) {
        dists(0) = dists(size); ids(0) = ids(size)
        siftDown(0)
      }
      i -= 1
    }
    n
  }

  /** Contents ascending by (dist, id); empties the heap. */
  def drain(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = size - 1
    while (i >= 0) {
      out(i) = (dists(0), ids(0))
      size -= 1
      if (size > 0) {
        dists(0) = dists(size); ids(0) = ids(size)
        siftDown(0)
      }
      i -= 1
    }
    out
  }
}
