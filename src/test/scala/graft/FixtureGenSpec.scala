package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture-derivation recipe — the measurement fixtures
  * (sf1/sf10/sf100) are regenerable inputs to every scale claim in
  * SCALING_*.md, so their statistical contracts are product contracts.
  * Small replica counts keep the spec cheap; the recipe is
  * replica-count-agnostic by construction (FIXTURES.md).
  */
class FixtureGenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("fixturegen-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def emb(spread: Boolean) =
    FixtureGen.tables(spark, replicas = 3, spread = spread)("embeddings")

  test("replica 0 is the sf0.1 corpus verbatim in both modes") {
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .selectExpr("vec_id", "xxhash64(to_json(struct(*))) AS h")
    for (spread <- Seq(false, true)) {
      val r0 = emb(spread).filter(col("vec_id") < 10000)
        .selectExpr("vec_id", "xxhash64(to_json(struct(*))) AS h")
      assert(r0.join(base, Seq("vec_id", "h"), "left_anti").count() === 0,
        s"replica 0 drifted from sf0.1 (spread=$spread)")
    }
  }

  test("clone mode keeps replicas within near-dup range; spread mode does not") {
    // pair each base vector with its replica-1 derivative and measure
    // the squared distance — the property that decides whether a
    // replicated fixture can serve as a bucket-occupancy scale point
    def cloneDist(spread: Boolean) = {
      // squaredL2 requires ARRAY<DOUBLE> (enforced at analysis since
      // the float-reinterpretation incident — see VectorExpressions)
      val e = emb(spread).withColumn("v",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val b = e.filter(col("vec_id") < 10000)
        .select(col("vec_id").as("id"), col("v").as("bv"))
      val r1 = e.filter(col("vec_id") >= 10000 && col("vec_id") < 20000)
        .select((col("vec_id") - 10000).as("id"), col("v").as("rv"))
      b.join(r1, "id")
        .select(graft.functions.VectorFunctions
          .squaredL2(col("bv"), col("rv")).as("d2"))
        .agg(avg("d2"), max("d2"), min("d2"))
        .head()
    }
    val clone = cloneDist(spread = false)
    // clone noise: ±0.05/dim uniform → E[d²] = 64·2·(0.1²/12) ≈ 0.107,
    // far inside the corpus's natural nn scale (~1.3)
    assert(clone.getDouble(0) < 0.2,
      s"clone-mode mean pair dist² drifted: ${clone.getDouble(0)}")
    val spread = cloneDist(spread = true)
    // spread: two independent std-0.125 points → E[d²] = 64·2·0.125² = 2.0
    assert(spread.getDouble(0) > 1.5 && spread.getDouble(0) < 2.5,
      s"spread-mode mean pair dist² off the i.i.d. envelope: ${spread.getDouble(0)}")
    assert(spread.getDouble(2) > 1.0,
      s"spread-mode min pair dist² should clear the near-dup scale: ${spread.getDouble(2)}")
  }

  test("spread replicas match the driver corpus's per-dim envelope") {
    // std 0.125 is the envelope the gated fixtures' per-projection
    // bucket fanout was measured on — the spread fixture must
    // reproduce it or measuredKeyDims's per-width occupancy division
    // stops matching the gated family's
    val r = emb(spread = true).filter(col("vec_id") >= 10000)
      .select(explode(col("embedding")).as("xf"))
      .select(col("xf").cast("double").as("x"))
      .agg(stddev_pop(col("x")), avg(col("x")), max(abs(col("x"))))
      .head()
    assert(math.abs(r.getDouble(0) - 0.125) < 0.003,
      s"per-dim std drifted from the 0.125 envelope: ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1)) < 0.01, s"per-dim mean off 0: ${r.getDouble(1)}")
    assert(r.getDouble(2) <= 0.2165 + 1e-6,
      s"spread range exceeded [-0.2165, 0.2165): ${r.getDouble(2)}")
  }
}
