package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

import graft.BaselineWorkload._
import graft.VectorKernel
import graft.operators.BoundedTopK

/** Scratch decomposition of the baseline search at a given core count
  * (VERDICT r6 task 5: the 32-core efficiency cliff) — replicates
  * [[graft.BaselineWorkload.run]]'s search phase with per-stage
  * timers (query prep + broadcast / scan job / merge job), so the
  * non-scaling fraction is attributed with data instead of guessed.
  * The scan is isolated by caching the packed partials and forcing
  * them with count(); the merge then runs against the cache.
  *
  * Usage: runMain graft.tools.BaselineStages [cores] [reps]
  */
object BaselineStages {
  def main(args: Array[String]): Unit = {
    val c = args.headOption.map(_.toInt).getOrElse(32)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$c]")
      .appName("graft-baseline-stages")
      .config("spark.sql.shuffle.partitions", c.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val dim = DIM; val nQ = Q; val k = K; val n = N
    val p = sys.env.get("SPARK_GRAFT_BASELINE_P").map(_.toInt).getOrElse(c)

    run(spark) // warm (JIT), discarded

    val blocks: RDD[ScanBlock] =
      sc.range(0L, n.toLong, 1L, p)
        .mapPartitions(ids => pack2(ids.map(id => (id, genVecF(1, id, dim))), dim))
        .cache()
    blocks.count()

    (1 to reps).foreach { r =>
      val tq = System.nanoTime()
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
      val qPrep = (System.nanoTime() - tq) / 1e9

      val TILE = math.max(64, 65536 / dim)
      val PadId = Long.MaxValue
      val t1 = System.nanoTime()
      val partial: RDD[(Array[Double], Array[Long])] = blocks.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val (qf, qn) = bcQ.value
          val heaps = Array.fill(nQ)(new BoundedTopK(k))
          it.foreach { block =>
            val bn = block.ids.length
            val flat = block.flat; val norms = block.norms; val ids = block.ids
            var t = 0
            while (t < bn) {
              val tEnd = math.min(bn, t + TILE)
              var q = 0
              while (q < nQ) {
                val qOff = q * dim; val h = heaps(q); val base = qn(q)
                var i = t
                while (i < tEnd) {
                  val dot = VectorKernel.dot(qf, qOff, flat, i * dim, dim)
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
            val e = heaps(q).drain()
            var j = 0
            while (j < e.length) { dOut(q * k + j) = e(j)._1; iOut(q * k + j) = e(j)._2; j += 1 }
            q += 1
          }
          Iterator.single((dOut, iOut))
        }
      }.persist(StorageLevel.MEMORY_ONLY)
      partial.count()
      val scanSec = (System.nanoTime() - t1) / 1e9

      val t2 = System.nanoTime()
      val (_, mi) = partial.treeReduce({ case ((ad, ai), (bd, bi)) =>
        val od = new Array[Double](nQ * k); val oi = new Array[Long](nQ * k)
        val h = new BoundedTopK(k)
        var q = 0
        while (q < nQ) {
          var j = q * k
          while (j < q * k + k) { h.offer(ad(j), ai(j)); h.offer(bd(j), bi(j)); j += 1 }
          val e = h.drain()
          var x = 0
          while (x < e.length) { od(q * k + x) = e(x)._1; oi(q * k + x) = e(x)._2; x += 1 }
          q += 1
        }
        (od, oi)
      }, depth = 2)
      val mergeSec = (System.nanoTime() - t2) / 1e9
      require(mi.count(_ != PadId) == nQ * k)
      partial.unpersist(blocking = true)
      bcQ.destroy()
      println(f"[bstage] cores=$c rep=$r qprep=$qPrep%.3f scan=$scanSec%.3f merge=$mergeSec%.3f s")
    }
    spark.stop()
  }

  // local mirror of BaselineWorkload.pack (private there)
  private def pack2(rows: Iterator[(Long, Array[Float])], dim: Int): Iterator[ScanBlock] = {
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
}
