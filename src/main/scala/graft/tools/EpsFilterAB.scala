package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** A/B of the fused early-exit ε-predicate
  * ([[graft.functions.expressions.SquaredL2Within]]) vs the unfused
  * `squaredL2(...) < eps` over the dedup chooser's exact-stage shape
  * (corpus × broadcast stride sample) — the measurement behind keeping
  * or dropping the fused form.
  *
  * Usage: runMain graft.tools.EpsFilterAB [sfDir] [eps] [stride] [reps]
  */
object EpsFilterAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/fixtures/sf1")
    val eps = args.lift(1).map(_.toDouble).getOrElse(1.1)
    val stride = args.lift(2).map(_.toLong).getOrElse(24L)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-eps-filter-ab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    val sample = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val base = e.crossJoin(broadcast(sample))
    def time(tag: String)(f: => Long): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime(); val c = f
        println(f"[$tag] rep$i count=$c in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("unfused")(base.filter(col("vec_id") =!= col("qid") &&
      (squaredL2(col("embedding"), col("qv")) < eps)).count())
    time("fused")(base.filter(col("vec_id") =!= col("qid") &&
      squaredL2Within(col("embedding"), col("qv"), eps)).count())
    spark.stop()
  }
}
