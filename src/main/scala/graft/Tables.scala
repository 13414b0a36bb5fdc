package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders.
  *
  * All operators take a scale-factor directory (`sfDir`) and read Parquet
  * directly, so Catalyst's data-source V2 scan handles column pruning and
  * predicate pushdown — at 100 TB the same code reads a partitioned
  * table; nothing here assumes single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Normalize `events.ts` to TimestampType regardless of the fixture
    * vintage: TIMESTAMP(NANOS) parquet (older driver fixtures) is read
    * as BIGINT nanos via the legacy flag and truncated to µs — exactly
    * what DuckDB does natively, so oracle timestamps agree;
    * timestamp[us] parquet (newer driver fixtures) arrives as
    * TIMESTAMP_NTZ and is cast to TimestampType, value-preserving
    * because every session pins spark.sql.session.timeZone=UTC. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast("timestamp"))
    case _ => df
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** The vector corpus — the zvdb-equivalent table
    * (reference: `src/hnsw.zig:44-50`, nodes map of id → point).
    * Embedding floats are cast to DOUBLE once here: all distance
    * arithmetic must accumulate in f64 so results are deterministic and
    * bit-identical to the DuckDB oracle (see FIXTURES.md).
    */
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))

  /** Scale-adaptive parallelism floor for MAP-ONLY pipelines rooted at
    * a small scan. The r14 map-only assignment/encode stages removed
    * their corpus-sized exchanges — correct at warehouse scale, where
    * scan parallelism comes from thousands of input splits — but on a
    * small fixture the whole corpus is 1–2 parquet splits (sf0.1: 1,
    * sf1: 2 at the default 128 MB split size), so everything downstream
    * of the scan ran near-serial: measured kmeans_iter 5.0 → 11.0 s at
    * sf1 after the exchange removal. The floor repartitions ONLY when
    * the scan has fewer splits than the session's parallelism — a
    * data-volume condition that is FALSE at production scale (more
    * splits than cores), so the exchange this helper adds exists
    * exactly where it is trivially cheap (the corpus fits in a few
    * splits) and vanishes where it would be corpus-sized. Row set is
    * unchanged (round-robin placement only; Spark's
    * sort-before-repartition keeps the assignment deterministic). */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
