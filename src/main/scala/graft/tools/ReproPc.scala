package graft.tools

import org.apache.spark.sql.SparkSession

/** Repro harness for the AQE PartitioningCollection crash: runs the
  * approx build's LAZY audit lineage at the given SF (the declared
  * operator's eager wrapper hides the failing plan), catches the
  * failure, and prints the AQE-current executed plan so the mismatched
  * join's two sides are visible.
  * Usage: runMain graft.tools.ReproPc [sfDir]
  */
object ReproPc {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-repro-pc")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.Ann.hnswEdgesApproxForAudit(spark, d)
    try {
      println(s"[repro] rows=${df.count()} — no crash")
    } catch {
      case t: Throwable =>
        println(s"[repro] CRASH: ${t.getMessage}")
        val p = df.queryExecution.executedPlan.toString
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/repro_pc_plan.txt"), p)
        println("[repro] executed plan written to /tmp/repro_pc_plan.txt")
    }
    spark.stop()
  }
}
