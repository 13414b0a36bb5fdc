package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the hnsw_edges_approx cold build
  * (VERDICT r6 task 6: sf1 cold cell 25.1 s → target ≤ ~15 s) —
  * decomposes the cold build into its stages so the optimization
  * targets the real cost: bucket generation + cap, the bve
  * (bucket ⋈ embedding) cache build, the probe-side explode, the
  * candidate-pair scoring join, and the full build with the TopMEdges
  * reduction. Also reports the candidate mass (scored pair count) so
  * knob changes (nProj, w, probe, cap) can be graded candidate-count
  * down, not just seconds down.
  *
  * Usage: runMain graft.tools.ApproxBuildProfile [sfDir] [nProj] [w]
  */
object ApproxBuildProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf1")
    val nProj = args.lift(1).map(_.toInt).getOrElse(8)
    val w = args.lift(2).map(_.toDouble).getOrElse(0.1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-approx-build-profile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[abprofile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm JIT at the smallest fixture, untimed (Bench discipline)
    graft.operators.Ann.hnswEdgesApprox(spark, "/root/testdata/sf0.001",
      nProj = nProj, w = w).count()

    // stage decomposition mirrors hnswEdgesApprox's body
    val b = time("buckets+cap+repartition") {
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("proj_id", "bucket").orderBy(col("vec_id"))
      val x = graft.operators.Ann.bucketsRaw(spark, d, nProj, w)
        .withColumn("rn", row_number().over(wb)).filter(col("rn") <= 1024)
        .drop("rn")
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      println(s"[abprofile]   bucket rows = ${x.count()}")
      x
    }
    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val bve = time("bve join+cache build") {
      val x = b.join(e, "vec_id").cache()
      println(s"[abprofile]   bve rows = ${x.count()}")
      x
    }
    time("candidate pair count (scored)") {
      val probed = bve.select(col("vec_id"), col("proj_id"),
        explode(sequence(col("bucket") - 1, col("bucket") + 1)).as("bucket"))
      val n = bve.as("l").join(probed.as("r"),
        col("l.proj_id") === col("r.proj_id") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") =!= col("r.vec_id")).count()
      println(s"[abprofile]   candidate pairs = $n")
    }
    bve.unpersist(blocking = true)
    // hypothesis check: TopMEdges is a TypedImperativeAggregate →
    // ObjectHashAggregate, which falls back to SORT-BASED aggregation
    // after 128 distinct keys per task (objectHashAggregate.sortBased.
    // fallbackThreshold) — with ~n×levels keys per map task that means
    // the whole candidate multiset gets externally sorted map-side
    for (thr <- Seq("1000000"); i <- 1 to 4) {
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      time(s"full build thr=$thr run $i") {
        val df = graft.operators.Ann.hnswEdgesApprox(spark, d, nProj = nProj, w = w)
        println(s"[abprofile]   edge rows = ${df.count()}")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
