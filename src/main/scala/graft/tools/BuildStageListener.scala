package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/task attribution for one query: runs the named
  * declared query once (after the sf0.001 JIT warm-up) with a listener
  * that prints every completed stage's wall time, task count, and
  * name — the decisive evidence for "where do the seconds go" when a
  * small-fixture query is stage-floor-bound rather than compute-bound.
  * Usage: runMain graft.tools.BuildStageListener <query> [sfDir] [reps]
  */
object BuildStageListener {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stage-listener")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // JIT warm
    @volatile var enabled = false
    var jobStart = Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (enabled) {
          val si = sc.stageInfo
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          println(f"[stage] id=${si.stageId}%4d wall=${wall}%6d ms tasks=${si.numTasks}%4d ${si.name.take(90)}")
        }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (enabled) { jobStart += js.jobId -> js.time }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (enabled) {
          val w = jobStart.get(je.jobId).map(je.time - _).getOrElse(-1L)
          println(f"[job]   id=${je.jobId}%4d wall=${w}%6d ms")
        }
    })
    for (r <- 1 to reps) {
      enabled = true
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      println(f"[total] rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      enabled = false
    }
    spark.stop()
  }
}
