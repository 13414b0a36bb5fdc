package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.expressions.{DotProduct, SimHash, SquaredL2Distance}

/** SQL surface for the native expressions, via
  * `SparkSessionExtensions` — so `spark.sql("SELECT squared_l2(a, b)")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` or launched with
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * This is the (c)-level integration path of the build rules: the
  * engine's operators never need it (they use the Column API), but a
  * SQL-only consumer gets the same codegen'd kernels.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[SquaredL2Distance].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("squared_l2"),
      info("squared_l2", "squared_l2(a, b) - squared Euclidean distance of two ARRAY<DOUBLE>"),
      (args: Seq[Expression]) => SquaredL2Distance(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two ARRAY<DOUBLE>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash48"),
      info("simhash48", "simhash48(hashes) - 48-bit SimHash of an ARRAY<BIGINT>"),
      (args: Seq[Expression]) => SimHash(args(0), 48)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of an ARRAY<BIGINT>"),
      (args: Seq[Expression]) => SimHash(args(0), 64)))
    // the whole-operator integration: KnnJoinPlan → KnnJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.KnnJoinStrategy)
  }
}

/** Imperative registration for an existing session (same functions). */
object GraftExtensions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("squared_l2",
      (args: Seq[Expression]) => SquaredL2Distance(args(0), args(1)), "scala_udf")
    r.createOrReplaceTempFunction("dot_product",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)), "scala_udf")
    r.createOrReplaceTempFunction("simhash48",
      (args: Seq[Expression]) => SimHash(args(0), 48), "scala_udf")
    r.createOrReplaceTempFunction("simhash64",
      (args: Seq[Expression]) => SimHash(args(0), 64), "scala_udf")
  }
}
