package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.rdd.RDD

import graft.operators.BoundedTopK

/** The reference-comparable benchmark workload, at the reference's own
  * scale, element type and configuration
  * (`benchmarks/shared_benchmarks.zig:53-59,62,91`; BASELINE.md):
  * N=100,000 points × 128 dims **f32**, Q=10,000 queries, k=10 —
  * parameterized over (n, dim, q, k) so the reference's DEFINED sweep
  * (dims {128, 512, 768, 1024} × k {10, 25, 50, 100},
  * `benchmarks/single_threaded_benchmarks.zig:28-33`) runs through the
  * identical code path ([[Bench]] emits the matrix).
  *
  *   - "insert" ≡ generate the corpus and materialize the packed
  *     partitioned scan blocks — the batch analogue of 100k `insert`
  *     calls building the HNSW structure (`src/hnsw.zig:73-117`).
  *     Reference: 11.92 s single-threaded at 128-dim.
  *   - "search" ≡ 10k queries answered **exactly** (recall 1.0) by a
  *     blocked brute-force scan using the ‖a−b‖² = ‖a‖²+‖b‖²−2a·b
  *     factorization — vs the reference's approximate greedy search
  *     (`src/hnsw.zig:194-236`, recall unmeasured and < 1).
  *     Reference: 3.73 s at 128-dim/k=10.
  *
  * Element type is f32 with f32 accumulation — exactly the arithmetic
  * the reference's generic `HNSW(f32)` performs in `distance`
  * (`src/hnsw.zig:182-192`).
  *
  * Physical design — the cluster shape, no shortcuts: the corpus never
  * touches the driver and never broadcasts; it is packed into per-
  * partition flat float blocks (cache-resident scan targets). The query
  * matrix broadcasts — the small side, as in any broadcast join.
  * Each partition emits its local top-k for ALL queries as one packed
  * primitive-array record; a treeReduce merges pairwise executor-side.
  * At 1000 executors × 10⁹ rows the identical plan holds — corpus
  * partitions scale out, queries broadcast, merge traffic stays P×Q×k
  * values and the driver sees only O(√P) pre-merged partials. The reference's global-mutex single-writer
  * design (`benchmarks/benchmark.md:1-8`) is the anti-pattern this
  * inverts: shared-nothing blocks, zero coordination.
  */
object BaselineWorkload {

  val N = 100000
  val DIM = 128
  val Q = 10000
  val K = 10

  /** Deterministic f32 vector for (salt, id) — seeded mirror of the
    * reference's random point generation. */
  def genVecF(salt: Int, id: Long, dim: Int = DIM): Array[Float] = {
    val v = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      var z = id * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L + salt * 0x94d049bb133111ebL
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^= z >>> 31
      v(j) = (java.lang.Long.remainderUnsigned(z, 1000001L) / 1000000.0 - 0.5).toFloat
      j += 1
    }
    v
  }

  /** Packed per-partition scan block: ids + row-major flat floats +
    * per-row squared norms. */
  final case class ScanBlock(ids: Array[Long], flat: Array[Float], norms: Array[Float])

  private def pack(rows: Iterator[(Long, Array[Float])], dim: Int): Iterator[ScanBlock] = {
    val buf = rows.toArray
    if (buf.isEmpty) Iterator.empty
    else {
      val n = buf.length
      val ids = new Array[Long](n)
      val flat = new Array[Float](n * dim)
      val norms = new Array[Float](n)
      var i = 0
      while (i < n) {
        ids(i) = buf(i)._1
        val v = buf(i)._2
        System.arraycopy(v, 0, flat, i * dim, dim)
        var acc = 0.0f; var j = 0
        while (j < dim) { acc += v(j) * v(j); j += 1 }
        norms(i) = acc
        i += 1
      }
      Iterator.single(ScanBlock(ids, flat, norms))
    }
  }

  /** Runs the workload at (n, dim, nQ, k); returns (buildSec,
    * searchSec). Search is exact, so recall@k ≡ 1.0 by construction. */
  def run(spark: SparkSession, n: Int = N, dim: Int = DIM,
          nQ: Int = Q, k: Int = K): (Double, Double) = {
    val sc = spark.sparkContext
    val p = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    // ---- "insert": generate + pack + materialize the partitioned blocks
    val t0 = System.nanoTime()
    val blocks: RDD[ScanBlock] =
      sc.range(0L, n.toLong, 1L, p)
        .mapPartitions(ids => pack(ids.map(id => (id, genVecF(1, id, dim))), dim))
        .cache()
    val nIndexed = blocks.map(_.ids.length.toLong).reduce(_ + _)
    require(nIndexed == n.toLong, s"indexed $nIndexed of $n")
    val buildSec = (System.nanoTime() - t0) / 1e9

    // ---- "search": blocked exact scan, per-partition top-k, merge
    val t1 = System.nanoTime()
    val qFlat = new Array[Float](nQ * dim)
    val qNorm = new Array[Float](nQ)
    var qi = 0
    while (qi < nQ) {
      val qv = genVecF(2, qi.toLong, dim)
      System.arraycopy(qv, 0, qFlat, qi * dim, dim)
      var acc = 0.0f; var j = 0
      while (j < dim) { acc += qv(j) * qv(j); j += 1 }
      qNorm(qi) = acc
      qi += 1
    }
    val bcQ = sc.broadcast((qFlat, qNorm))

    // Corpus tiles sized for L2: each tile stays cache-hot across all
    // nQ queries instead of every query re-streaming the whole
    // partition block from L3/RAM. ~256 KB of corpus rows per tile at
    // any dim (512 rows × 128 f32 = 65536 floats).
    val TILE = math.max(64, 65536 / dim)
    // Each partition emits ONE record: its Q×k local top-k packed into
    // two primitive arrays (dist, id), query q's slot at [q·k, (q+1)·k)
    // ascending, padded with (+∞, Long.MaxValue) when a slice holds
    // fewer than k rows. The previous shape emitted Q records of boxed
    // tuple arrays per partition and merged via reduceByKey — P×Q×k
    // boxed records through the shuffle machinery. That fixed
    // per-partition cost (emission, ser/deser, shuffle bookkeeping)
    // grows linearly with core count while the scan work shrinks, and
    // it was the measured serial fraction behind the 32-core
    // efficiency cliff (SCALING_CORES r6: 0.39). Merge traffic is
    // still P×Q×k values — just 2 flat arrays per partition instead
    // of Q object records.
    val PadId = Long.MaxValue
    val partial: RDD[(Array[Double], Array[Long])] = blocks.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val (qf, qn) = bcQ.value
        val heaps = Array.fill(nQ)(new BoundedTopK(k))
        it.foreach { block =>
          val n = block.ids.length
          val flat = block.flat
          val norms = block.norms
          val ids = block.ids
          var t = 0
          while (t < n) {
            val tEnd = math.min(n, t + TILE)
            var q = 0
            while (q < nQ) {
              val qOff = q * dim
              val h = heaps(q)
              val base = qn(q)
              var i = t
              while (i < tEnd) {
                val off = i * dim
                val dot = VectorKernel.dot(qf, qOff, flat, off, dim)
                h.offer((base + norms(i) - 2.0f * dot).toDouble, ids(i))
                i += 1
              }
              q += 1
            }
            t = tEnd
          }
        }
        val dOut = Array.fill(nQ * k)(Double.PositiveInfinity)
        val iOut = Array.fill(nQ * k)(PadId)
        var q = 0
        while (q < nQ) {
          heaps(q).drainInto(dOut, iOut, q * k)
          q += 1
        }
        Iterator.single((dOut, iOut))
      }
    }
    // treeReduce: executor-side pairwise merges first, so the driver
    // sees O(√P) partials instead of P — at 1000 executors the driver
    // never holds P×Q×k. Each pairwise merge re-offers both packed
    // slices into a bounded heap, so merge order is irrelevant to the
    // result (same total order as the scan's heaps).
    val (_, mi) = partial.treeReduce({ case ((ad, ai), (bd, bi)) =>
      val od = new Array[Double](nQ * k)
      val oi = new Array[Long](nQ * k)
      val h = new BoundedTopK(k)
      var q = 0
      while (q < nQ) {
        var j = q * k
        while (j < q * k + k) {
          h.offer(ad(j), ai(j)); h.offer(bd(j), bi(j)); j += 1
        }
        h.drainInto(od, oi, q * k)
        q += 1
      }
      (od, oi)
    }, depth = 2)
    val total = mi.count(_ != PadId).toLong
    require(total == nQ.toLong * math.min(k.toLong, n.toLong),
      s"expected ${nQ.toLong * math.min(k.toLong, n.toLong)} results, got $total")
    val searchSec = (System.nanoTime() - t1) / 1e9

    blocks.unpersist()
    // the query broadcast is per-run state (at dim 1024 it is ~40 MB
    // of executor blocks); the sweep runs this method ~20 times, so
    // relying on GC-driven ContextCleaner reclamation let stale
    // broadcasts pile up mid-sweep — release it deterministically,
    // outside both timed spans
    bcQ.destroy()
    (buildSec, searchSec)
  }
}
