package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-attribution for the [[graft.operators.Ann.hnswEdgesApprox]]
  * build: times the build at refine = 0/1/2 and with the measurement
  * stages already memoized vs cold, so the 20 s sf1 build cost can be
  * split into seed-scoring + TopM, per-NND-round cost, and the
  * measured-knob stages — the decomposition ApproxBuildProfile's
  * single full-build timing cannot see.
  *
  * Usage: runMain graft.tools.ApproxBuildStages [sfDir]
  */
object ApproxBuildStages {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-approx-build-stages")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[abstages] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    def free(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // warm JIT once, untimed (Bench discipline)
    graft.operators.Ann.hnswEdgesApprox(spark, "/root/testdata/sf0.001").count()
    free()

    // measurement stages first: their memo makes later builds cheaper,
    // mirroring what Bench's min-of-N actually measures after rep 1
    for (r <- 0 to 2; rep <- 1 to 2) {
      time(s"build refine=$r rep$rep") {
        val df = graft.operators.Ann.hnswEdgesApprox(spark, d, refine = r)
        val n = df.count()
        free(); n
      }
    }
    spark.stop()
  }
}
