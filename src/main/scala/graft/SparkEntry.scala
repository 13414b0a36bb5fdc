package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator module contributes a `queries` map (name → DataFrame
  * builder over a scale-factor dir) and, where ANSI-SQL-expressible, an
  * `oracles` map with the equivalent DuckDB SQL. The driver runs each
  * query at sf0.01, the oracle in DuckDB, and hash-compares.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    QueryModule(operators.Knn.queries, operators.Knn.oracles),
    QueryModule(operators.Similarity.queries, operators.Similarity.oracles),
    QueryModule(operators.TextOps.queries, operators.TextOps.oracles),
    QueryModule(operators.Relational.queries, operators.Relational.oracles),
    QueryModule(operators.EventsOps.queries, operators.EventsOps.oracles),
    QueryModule(operators.Ann.queries, operators.Ann.oracles),
    QueryModule(streaming.StreamingOps.queries, streaming.StreamingOps.oracles),
    QueryModule(multimodal.Multimodal.queries, multimodal.Multimodal.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Knn.knnTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}

/** A bundle of declared queries + their DuckDB oracles. */
final case class QueryModule(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String])
