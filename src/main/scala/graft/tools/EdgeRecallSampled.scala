package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sampled edge recall of the approximate index build at scales where
  * the full exact m-NN graph is out of reach (sf10: 200k² pairs). For
  * a deterministic sample of source nodes, the exact top-m neighbor
  * set is computed by a broadcast-sample × corpus scan (|S|·n pairs —
  * seconds), and the approximate build's level-0 edges for those
  * sources are graded against it. This is the 100×-point recall
  * measurement behind the membership cap's quality claim: the cap
  * bounds candidate mass (time stays ~flat sf1 → sf10), and THIS
  * tool shows what that bound costs in edge quality.
  *
  * Usage: runMain graft.tools.EdgeRecallSampled [sfDir] [sampleStride] [m]
  */
object EdgeRecallSampled {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf10")
    val stride = args.lift(1).map(_.toInt).getOrElse(1000)
    val m = args.lift(2).map(_.toInt).getOrElse(16)
    val refine = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-edge-recall-sampled")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Ann

    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val sample = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("src"), col("embedding").as("sv"))
    // exact top-m for the sampled sources: broadcast the sample, scan
    // the corpus once — |S|·n distance evaluations
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("dist"), col("dst"))
    val exact = e.crossJoin(broadcast(sample))
      .filter(col("vec_id") =!= col("src"))
      .select(col("src"), col("vec_id").as("dst"),
        graft.functions.VectorFunctions.squaredL2(col("embedding"), col("sv")).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= m)
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val t0 = System.nanoTime()
    val approx = Ann.hnswEdgesApprox(spark, d, m = m, refine = refine)
      .filter(col("level") === 0)
      .join(broadcast(sample.select(col("src"))), Seq("src"), "left_semi")
      .select(col("src"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val buildSec = (System.nanoTime() - t0) / 1e9
    val rec = approx.intersect(exact).size.toDouble / exact.size
    val srcs = exact.map(_._1).size
    println(f"[sampled-recall] d=$d sampled_srcs=$srcs m=$m refine=$refine " +
      f"level0_edge_recall=$rec%.4f exact=${exact.size} " +
      f"approx_for_sample=${approx.size} build_sec=$buildSec%.1f")
    spark.stop()
  }
}
