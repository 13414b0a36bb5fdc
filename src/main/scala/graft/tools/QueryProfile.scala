package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch single-query timer: run one declared query (or a
  * comma-separated list) from [[graft.SparkEntry.queries]] against an
  * arbitrary fixture dir, repeated, with per-run wall seconds — the
  * tool the scale-proof analysis uses to chase an individual query's
  * sf0.1→sf1 ratio without paying a full Bench sweep.
  *
  * Usage: runMain graft.tools.QueryProfile <query[,query...]> [sfDir] [reps]
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("hnsw_search").split(",").toSeq
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-query-profile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      // warm at the smallest fixture (JIT + codegen), untimed
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, d).count()
        println(f"[qprofile] $name%-24s run $i  ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      }
    }
    spark.stop()
  }
}
