package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                 o_totalprice: Double)

/** Relational extras: sketch accuracy and the typed Dataset surface. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("relational-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val d = "/root/testdata/sf0.01"

  test("approx_count_distinct sketch within 5% of exact") {
    val li = Tables.lineitem(spark, d)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("typed Dataset pipeline: case-class encoder, typed filter + groupByKey") {
    val s = spark
    import s.implicits._
    val ds: Dataset[Order] = Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
    val perStatus = ds
      .filter(_.o_totalprice > 100000.0)
      .groupByKey(_.o_orderstatus)
      .mapGroups { (status: String, orders: Iterator[Order]) =>
        val prices = orders.map(_.o_totalprice).toArray
        (status, prices.length, prices.max)
      }
      .collect().sortBy(_._1)
    // cross-check against the untyped plan
    val expected = Tables.orders(spark, d)
      .filter(col("o_totalprice") > 100000.0)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), max("o_totalprice").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1).toInt, r.getDouble(2)))
      .sortBy(_._1)
    assert(perStatus.toSeq == expected.toSeq)
  }

  test("sources: documents round-trip through JSON-lines, CSV and ORC sinks") {
    // the engine is parquet-first, but a pipeline's edges speak
    // JSON/CSV (text interchange) and ORC (the other columnar lake
    // format); prove the same DataFrame survives all three
    // byte-identically (text columns contain spaces/punctuation, so
    // this exercises quoting/escaping and multi-line CSV reads)
    val docs = Tables.documents(spark, d)
    val schema = docs.schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_sources").toString
    docs.write.mode("overwrite").json(s"$tmp/json")
    docs.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(s"$tmp/csv")
    docs.write.mode("overwrite").orc(s"$tmp/orc")
    val fromJson = spark.read.schema(schema).json(s"$tmp/json")
    val fromCsv = spark.read.schema(schema)
      .option("header", "true").option("escape", "\"").option("multiLine", "true")
      .csv(s"$tmp/csv")
    val fromOrc = spark.read.schema(schema).orc(s"$tmp/orc")
    for ((rt, fmt) <- Seq((fromJson, "json"), (fromCsv, "csv"), (fromOrc, "orc"))) {
      assert(rt.count() == docs.count(), s"$fmt row count")
      assert(rt.except(docs).count() == 0 && docs.except(rt).count() == 0,
        s"$fmt round-trip altered rows")
    }
    // ORC scans push filters and prune columns like parquet — the
    // lake-format contract the engine's scale posture relies on
    val p = fromOrc.filter(col("doc_id") === 7L).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), s"ORC scan pushed no filters:\n$p")
  }

  test("set ops: presence tags are disjoint and cover customer nations") {
    val res = operators.Relational.nationPresence(spark, d).collect()
    val byTag = res.groupBy(_.getString(2)).view.mapValues(_.map(_.getInt(0)).toSet).toMap
    val both = byTag.getOrElse("both", Set.empty)
    val custOnly = byTag.getOrElse("customers_only", Set.empty)
    assert(both.intersect(custOnly).isEmpty)
    val custNations = Tables.customer(spark, d)
      .select("c_nationkey").distinct().collect().map(_.getInt(0)).toSet
    assert(both.union(custOnly) == custNations)
  }
}
