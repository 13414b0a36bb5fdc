package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch latency profiler for the hnsw_search descent (VERDICT r5
  * task 6: 1.66 s @ sf0.1, target ≤1.2 s) — times the stages of the
  * serving path separately so the optimization targets the real cost:
  * index read/cache, entry/top-level statistics, first full search
  * (pays slice-cache materialization), then steady-state repeats. */
object HnswProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-hnsw-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm JIT on the small fixture like Bench does
    graft.operators.Ann.hnswSearch(spark, "/root/testdata/sf0.001").count()

    time("ensureFullIndexVec.count") {
      graft.operators.Ann.ensureFullIndexVec(spark, d).count()
    }
    (1 to 5).foreach { i =>
      time(s"hnswSearch run $i") {
        graft.operators.Ann.hnswSearch(spark, d).count()
      }
    }
    spark.stop()
  }
}
