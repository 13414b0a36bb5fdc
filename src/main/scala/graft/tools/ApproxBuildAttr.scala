package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Finer-grained attribution for the approx build than
  * [[ApproxBuildStages]] (which frees the measurement memo between
  * reps, so every rep re-pays the exact-sample stage and the NND-round
  * deltas drown): times each EAGER phase the build runs — corpus
  * count, measured key dims, the sampled-exact ground truth (cold then
  * memoized), the capture probe — and then full builds at refine =
  * 0/2 WITHOUT dropping the memo, so (refine=2 − refine=0) is the real
  * two-round NND cost and (refine=0 − measurement) is the seed+TopM
  * stage.
  * Usage: runMain graft.tools.ApproxBuildAttr [sfDir] [reps]
  */
object ApproxBuildAttr {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-approx-build-attr")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ann

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[attr] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warm JIT once, untimed (Bench discipline); leaves the sf0.001
    // memo behind, which is keyed per-dir so it cannot serve `d`
    Ann.hnswEdgesApprox(spark, "/root/testdata/sf0.001").count()

    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val cnt = time("count")(e.count())
    val keyDims = time("measuredKeyDims")(
      Ann.measuredKeyDims(e, cnt, 8, 0.1))
    val stride = Ann.captureSampleStride(cnt)
    val exact = time("sampledExactPairs COLD")(
      { val x = Ann.sampledExactPairsCached(spark, d, e, stride, 16); x.count(); x })
    time("sampledExactPairs memoized")(
      Ann.sampledExactPairsCached(spark, d, e, stride, 16).count())
    time("measuredCapture run1")(
      Ann.measuredCapture(e, exact, keyDims, 8, 0.1, 1))
    time("measuredCapture run2")(
      Ann.measuredCapture(e, exact, keyDims, 8, 0.1, 1))
    time("measuredCapture run3")(
      Ann.measuredCapture(e, exact, keyDims, 8, 0.1, 1))
    for (r <- 1 to reps) {
      time(s"full build refine=0 rep$r")(
        Ann.hnswEdgesApprox(spark, d, refine = 0).count())
      time(s"full build refine=2 rep$r")(
        Ann.hnswEdgesApprox(spark, d).count())
    }
    spark.stop()
  }
}
