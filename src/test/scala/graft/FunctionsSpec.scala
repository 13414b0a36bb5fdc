package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.BroadcastKnnJoin

/** SQL-surface registration + ScalaCheck properties with brute-force
  * in-test oracles (SURVEY §5: metric axioms, pruning counts). */
class FunctionsSpec extends AnyFunSuite {
  private def check(p: Prop, minSuccessful: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), p)
    assert(res.passed, res.status.toString)
  }
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("functions-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("squared_l2 / dot_product / simhash48 usable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT squared_l2(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS p,
        |       simhash48(array(7L)) AS s""".stripMargin).head()
    assert(r.getDouble(0) == 25.0)
    assert(r.getDouble(1) == 11.0)
    // single hash 7 = bits 0,1,2 set -> votes +1 there, -1 elsewhere;
    // packing puts bit b at position (47-b): value = 2^47 + 2^46 + 2^45
    assert(r.getLong(2) == (1L << 47) + (1L << 46) + (1L << 45))
  }

  test("metric axioms on random vectors (property)") {
    val s = spark
    import s.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
    check(Prop.forAll(vecGen, vecGen) { (a: Array[Double], b: Array[Double]) =>
      val df = Seq((a, b)).toDF("a", "b")
      val row = df.select(
        graft.functions.VectorFunctions.squaredL2(col("a"), col("b")).as("ab"),
        graft.functions.VectorFunctions.squaredL2(col("b"), col("a")).as("ba"),
        graft.functions.VectorFunctions.squaredL2(col("a"), col("a")).as("aa")).head()
      val brute = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.foldLeft(0.0)(_ + _)
      row.getDouble(0) == brute && row.getDouble(1) == row.getDouble(0) &&
        row.getDouble(2) == 0.0
    })
  }

  test("knn matches brute force on random corpora (property)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(40)
      val k = 1 + rnd.nextInt(12)
      val corpus = (0 until n).map(i => (i.toLong, Array.fill(4)(rnd.nextInt(10).toDouble)))
      val qv = Array.fill(4)(rnd.nextInt(10).toDouble)
      val corpusDF = corpus.toDF("vec_id", "embedding")
      val qDF = Seq((999L, qv)).toDF("vec_id", "embedding")
      val got = BroadcastKnnJoin(spark, corpusDF, qDF, k)
        .orderBy("rnk").collect()
        .map(r => (r.getLong(1), r.getDouble(2)))
      val want = corpus.map { case (id, v) =>
        (id, v.zip(qv).map { case (x, y) => (x - y) * (x - y) }.foldLeft(0.0)(_ + _))
      }.sortBy { case (id, dd) => (dd, id) }.take(k)
      assert(got.toSeq == want.toSeq, s"n=$n k=$k")
    }
  }
}
