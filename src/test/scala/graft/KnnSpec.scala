package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BroadcastKnnJoin, BoundedTopK}
import graft.functions.VectorFunctions._

/** Ports of the reference's behavioral test properties
  * (`src/test_hnsw.zig`, SURVEY §5) against the Spark engine, plus
  * native-vs-HOF expression cross-checks.
  *
  * Memory-leak and lock-concurrency tests from the reference are
  * JVM/Spark-managed concerns with no engine counterpart; the stress
  * test lives in Bench at sf0.1.
  */
class KnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("knn-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def vecsDF(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")
  }

  def knn(corpus: DataFrame, queries: DataFrame, k: Int, excludeSelf: Boolean = false) =
    BroadcastKnnJoin(spark, corpus, queries, k, excludeSelf = excludeSelf)
      .orderBy(col("query_id"), col("rnk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  // test_hnsw.zig "Basic Functionality" (:24-41)
  test("k=2 of 3 points returns 2, ascending by distance") {
    val corpus = vecsDF(Seq(
      0L -> Seq(1.0, 2.0, 3.0), 1L -> Seq(4.0, 5.0, 6.0), 2L -> Seq(7.0, 8.0, 9.0)))
    val q = vecsDF(Seq(100L -> Seq(1.0, 2.0, 3.0)))
    val res = knn(corpus, q, 2)
    assert(res.length == 2)
    assert(res.map(_._2).toSeq == Seq(0L, 1L))
    assert(res(0)._3 == 0.0 && res(1)._3 == 27.0)
    assert(res(0)._3 <= res(1)._3)
  }

  // test_hnsw.zig "Empty Index" (:43-53)
  test("empty corpus returns empty result, not an error") {
    val corpus = vecsDF(Seq.empty)
    val q = vecsDF(Seq(0L -> Seq(1.0, 2.0)))
    assert(knn(corpus, q, 5).isEmpty)
  }

  // test_hnsw.zig "Single Point" (:55-68)
  test("single point self-retrieval at distance 0") {
    val corpus = vecsDF(Seq(7L -> Seq(0.5, -0.5, 2.0)))
    val res = knn(corpus, corpus, 3)
    assert(res.toSeq == Seq((7L, 7L, 0.0, 1)))
  }

  // test_hnsw.zig "Edge Cases" (:104-126)
  test("duplicate points both retrievable; k > n returns n") {
    val corpus = vecsDF(Seq(
      0L -> Seq(1.0, 1.0), 1L -> Seq(1.0, 1.0), 2L -> Seq(9.0, 9.0)))
    val q = vecsDF(Seq(50L -> Seq(1.0, 1.0)))
    val res = knn(corpus, q, 10)
    assert(res.length == 3) // k > n clamps to n
    assert(res.take(2).map(_._2).toSeq == Seq(0L, 1L)) // dupes, id tie-break
    assert(res(0)._3 == 0.0 && res(1)._3 == 0.0)
  }

  // test_hnsw.zig "Large Dataset" (:70-102) on the sf0.001 fixture
  test("fixture corpus: exactly k results per query, ascending (dist, id)") {
    val res = knn(
      Tables.embeddings(spark, "/root/testdata/sf0.001"),
      Tables.embeddings(spark, "/root/testdata/sf0.001").filter(col("vec_id") < 5), 10)
    assert(res.length == 50)
    res.groupBy(_._1).values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(r => (r._3, r._2))
      assert(g.toSeq == sorted.toSeq)
    }
  }

  test("KnnJoinExec operator ≡ BroadcastKnnJoin function, bitwise") {
    val d = "/root/testdata/sf0.01"
    val corpus = Tables.embeddings(spark, d)
    val q = corpus.filter(col("vec_id") < 10)
    val viaOperator = graft.plans.KnnJoin.exact(corpus, q, 10)
      .select("query_id", "vec_id", "dist", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(r => (r._1, r._4))
    val viaFunction = operators.BroadcastKnnJoin(spark, corpus, q, 10)
      .select("query_id", "vec_id", "dist", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(r => (r._1, r._4))
    assert(viaOperator.toSeq == viaFunction.toSeq)
  }

  test("knn_pagerank over the approximate index tracks the exact-graph ranks") {
    // the composed scale path: the same scaled-integer PageRank run
    // over hnsw_edges_approx's level-0 adjacency must surface (nearly)
    // the same top-k central nodes as the exact m-NN graph — the
    // lifecycle promise that graph analytics also survives swapping
    // the O(n²) build for the LSH+NND one. Pinned as top-20 set
    // overlap; at gate scale the approximate graph holds ≥0.99 edge
    // recall, so rank agreement should be near-total.
    val d = "/root/testdata/sf0.01"
    val exact = operators.Knn.knnPagerank(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = operators.Knn.knnPagerankApprox(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val overlap = exact.intersect(approx).size.toDouble / exact.size
    info(f"approximate-graph pagerank top-20 overlap = $overlap%.2f")
    assert(overlap >= 0.8, f"approx centrality diverged: overlap $overlap%.2f")
  }

  // test_hnsw.zig "Consistency" (:275-317)
  test("repeated identical searches return identical results") {
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = corpus.filter(col("vec_id") === 3)
    val a = knn(corpus, q, 10).toSeq
    val b = knn(corpus, q, 10).toSeq
    assert(a == b)
  }

  // test_hnsw.zig "Different Data Types" (:239-273): integer vectors
  test("integer vectors work through the double pipeline") {
    val s = spark
    import s.implicits._
    val corpus = Seq((0L, Array(1, 2, 3)), (1L, Array(10, 20, 30)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val q = corpus.filter(col("vec_id") === 0)
    val res = BroadcastKnnJoin(spark, corpus, q, 2).orderBy("rnk").collect()
    assert(res.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(res(1).getDouble(2) == 81.0 + 324.0 + 729.0)
  }

  // test_hnsw.zig "Concurrent Access" (:154-209): the reference
  // serializes 8 writer threads behind one mutex; Spark's analogue is
  // concurrent queries on one session — genuinely parallel, no locks.
  test("concurrent queries return identical, correct results") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = corpus.filter(col("vec_id") === 3)
    val futures = (1 to 4).map { _ =>
      Future(knn(corpus, q, 10).toSeq)
    }
    val results = Await.result(Future.sequence(futures), 120.seconds)
    assert(results.forall(_ == results.head))
    assert(results.head.length == 10)
  }

  test("native SquaredL2/Dot expressions bitwise-match the HOF forms") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(broadcast(q)).select(
      squaredL2(col("embedding"), col("qv")).as("native"),
      squaredL2Hof(col("embedding"), col("qv")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("knnGraph: m edges per node, no self edges, ascending per src") {
    val g = operators.Knn.knnGraph(spark, "/root/testdata/sf0.001", m = 4).collect()
    val bySrc = g.groupBy(_.getLong(0))
    assert(bySrc.size == 500 && bySrc.values.forall(_.length == 4))
    assert(g.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("integer element width round-trips through the operators") {
    // The reference's generic HNSW(T) supports integer elements
    // (src/test_hnsw.zig:239-273 exercises i32/f64). The engine
    // canonicalizes ARRAY<DOUBLE>; this pins that an i32-valued corpus
    // (exactly representable in double) survives the round trip and
    // ranks identically to a driver-side integer-arithmetic oracle.
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(x * 100) AS INT))").as("iv"))
    val asDouble = e.select(col("vec_id"), col("iv").cast("array<double>").as("embedding"))
    val q = asDouble.filter(col("vec_id") === 0)
    val res = BroadcastKnnJoin(spark, asDouble, q, 5)
      .orderBy(col("rnk")).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    // driver-side oracle in pure Long arithmetic
    val rows = e.collect().map(r => (r.getLong(0), r.getSeq[Int](1).toArray))
    val qv = rows.find(_._1 == 0L).get._2
    val brute = rows.map { case (id, v) =>
      val dd = v.zip(qv).map { case (a, b) => val x = (a - b).toLong; x * x }.sum
      (dd, id)
    }.sorted.take(5).map { case (dd, id) => (id, dd.toDouble) }
    assert(res.toSeq == brute.toSeq)
  }

  test("epsilonJoin matches brute force on the fixture") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val fast = operators.BlockKnnJoin.epsilonJoin(spark, e, 1.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = e.select(col("vec_id").as("src"), col("embedding").as("sv"))
    val r = e.select(col("vec_id").as("dst"), col("embedding").as("dv"))
    val brute = l.crossJoin(r)
      .filter(col("src") < col("dst"))
      .filter(squaredL2Hof(col("sv"), col("dv")) < 1.2)
      .select(col("src"), col("dst"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == brute && fast.nonEmpty)
  }

  test("knnPagerank: exact match vs an in-test integer replay; mass conserved") {
    val d = "/root/testdata/sf0.001"
    val Scale = 1000000000000L
    val edges = graft.operators.Knn.knnGraph(spark, d).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = edges.map(_._1).distinct.sorted
    val n = ids.length.toLong
    val od = math.min(16L, n - 1)
    val tele = 15L * Scale / (100L * n)
    // independent replay of the scaled-integer recurrence
    var pr = ids.map(_ -> Scale / n).toMap
    (1 to 3).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => 85L * pr(src) / (100L * od) }.sum
      }
      pr = ids.map(id => id -> (tele + contrib.getOrElse(id, 0L))).toMap
    }
    val expected = pr.toSeq.sortBy { case (id, p) => (-p, id) }.take(20)
    val got = graft.operators.Knn.knnPagerank(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, "pagerank diverges from the integer replay")
    // coreset_select: the same ranks stratified per label, top-5 each
    val labels = Tables.embeddings(spark, d).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expectedCoreset = pr.toSeq
      .map { case (id, p) => (labels(id), id, p) }
      .groupBy(_._1).toSeq.flatMap { case (lab, rows) =>
        rows.sortBy { case (_, id, p) => (-p, id) }.take(5).zipWithIndex
          .map { case ((_, id, p), i) => (lab, i + 1, id, p) }
      }.sortBy(t => (t._1, t._2))
    val gotCoreset = graft.operators.Knn.coresetSelect(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotCoreset == expectedCoreset, "coreset diverges from the stratified replay")
    // floor division only LOSES mass: total stays within n·(od+1)·iters
    // ulps of the invariant SCALE, and never exceeds it
    val total = pr.values.sum
    assert(total <= Scale, s"mass grew: $total > $Scale")
    assert(total >= Scale - n * (od + 1) * 3, s"mass leak too large: $total")
  }

}

/** BoundedTopK property tests vs a sort-based oracle. */
class BoundedTopKSpec extends AnyFunSuite {
  test("keeps the k smallest by (dist, id), ascending, with ties") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(12)
      val xs = Seq.fill(n)((rnd.nextInt(8).toDouble, rnd.nextLong() % 100))
      val h = new BoundedTopK(k)
      xs.foreach { case (d, id) => h.offer(d, id) }
      val got = h.drain().toSeq
      val want = xs.sorted.take(k)
      assert(got == want, s"trial $trial n=$n k=$k")
    }
  }

  test("sqDistBounded contract: survivors bit-equal sqDist, abandons strictly exceed the bound") {
    import graft.operators.BlockKnnJoin.{sqDist, sqDistBounded}
    val rnd = new scala.util.Random(99)
    def randVec(n: Int, weird: Boolean): Array[Double] =
      Array.fill(n) {
        val r = rnd.nextInt(if (weird) 20 else 100)
        if (weird && r == 0) Double.NaN
        else if (weird && r == 1) Double.PositiveInfinity
        else rnd.nextDouble() * 10 - 5
      }
    for (trial <- 1 to 500) {
      val n = rnd.nextInt(80)
      val weird = trial % 5 == 0
      val a = randVec(n, weird); val b = randVec(n, weird)
      val exact = sqDist(a, b)
      // bounds including the EXACT distance itself (the tie case a
      // weakened strict > would break: result must stay exact so the
      // (dist, id) order can decide), ±ulp, 0, and the infinities
      val bounds = Seq(exact, Math.nextUp(exact), Math.nextDown(exact),
        0.0, exact / 2, exact * 2, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.NaN)
      bounds.foreach { bd =>
        val got = sqDistBounded(a, b, bd)
        if (!(got > bd)) // survivor (also: any NaN total never abandons)
          assert(java.lang.Double.doubleToRawLongBits(got) ==
            java.lang.Double.doubleToRawLongBits(exact),
            s"trial $trial bound=$bd: survivor $got != exact $exact")
        else // abandoned: the exact total can never beat the bound
          assert(java.lang.Double.compare(exact, bd) > 0,
            s"trial $trial bound=$bd: abandoned but exact $exact <= bound")
      }
      // note: a NaN TOTAL may still abandon on an earlier finite
      // partial — outcome-identical (exact NaN orders above any finite
      // bound, so both the partial and the exact total are rejected by
      // the same compare), which the contract assertions above cover
    }
  }

  test("k = 0: bound is total-rejection, offers are no-ops, drain empty") {
    val h = new BoundedTopK(0)
    assert(h.bound == Double.NegativeInfinity) // was AIOOBE on dists(0)
    h.offer(1.0, 1L); h.offer(Double.NaN, 2L)
    assert(h.drain().isEmpty)
  }

  test("NaN distances order LAST (Spark SQL / DuckDB rank): admitted " +
      "under-filled, evicted first, never displacing a finite neighbor") {
    // under-filled heap: NaN is kept (the SQL top-k would include it
    // when fewer than k finite candidates exist) but sorts last
    val h = new BoundedTopK(3)
    h.offer(Double.NaN, 7L); h.offer(2.0, 1L)
    val partial = h.drain().toSeq
    assert(partial.map(_._2) == Seq(1L, 7L) && partial(1)._1.isNaN,
      s"under-filled NaN placement: $partial")
    // full heap: finite arrivals evict the NaN, and a NaN candidate
    // can never displace a finite resident
    val h2 = new BoundedTopK(2)
    h2.offer(Double.NaN, 7L); h2.offer(2.0, 1L); h2.offer(3.0, 2L)
    h2.offer(Double.NaN, 9L)
    assert(h2.drain().toSeq == Seq((2.0, 1L), (3.0, 2L)))
    // abandon-path integration: a NaN distance total (e.g. Inf−Inf in
    // sqDistBounded, which never satisfies `acc > bound` and so runs
    // to completion) must flow through offer() and land NaN-last, not
    // be dropped by a <= admission test at the call site
    val h3 = new BoundedTopK(2)
    h3.offer(Double.NaN, 5L)
    val only = h3.drain().toSeq
    assert(only.size == 1 && only.head._2 == 5L && only.head._1.isNaN)
  }
}

/** DedupTopM vs distinct-then-sort oracle: the heap over a candidate
  * MULTISET (each id always paired with the same dist, as in the LSH
  * candidate streams) must equal top-m of the distinct set, under any
  * offer order, any duplicate placement (retained-dup, evicted-reoffer)
  * and any partial/merge split. */
class DedupTopMSpec extends AnyFunSuite {
  import graft.functions.expressions.DedupTopM

  private def oracle(xs: Seq[(Double, Long)], m: Int): Seq[(Double, Long)] =
    xs.distinct.sorted.take(m)

  test("multiset offers equal distinct top-m, any order") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 100) {
      val ids = Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong() % 50)
      // dist is a FUNCTION of id (ties made common with a small range)
      val base = ids.distinct.map(id => id -> rnd.nextInt(6).toDouble).toMap
      val stream = rnd.shuffle(ids.flatMap(id => Seq.fill(1 + rnd.nextInt(3))((base(id), id))))
      val m = 1 + rnd.nextInt(8)
      val h = new DedupTopM(m)
      stream.foreach { case (d, id) => h.offer(d, id) }
      val (ds, is, n) = h.sortedAsc
      val got = (0 until n).map(i => (ds(i), is(i)))
      assert(got == oracle(stream, m), s"trial $trial m=$m")
    }
  }

  test("merge of split streams equals single-stream result, with serde roundtrip") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 100) {
      val ids = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() % 60)
      val base = ids.distinct.map(id => id -> rnd.nextInt(5).toDouble).toMap
      val stream = ids.map(id => (base(id), id))
      val m = 1 + rnd.nextInt(10)
      val cut = rnd.nextInt(stream.size + 1)
      val (a, b) = stream.splitAt(cut)
      val ha = new DedupTopM(m); a.foreach { case (d, id) => ha.offer(d, id) }
      val hb = new DedupTopM(m); b.foreach { case (d, id) => hb.offer(d, id) }
      val hb2 = graft.functions.expressions.DedupTopM.fromBytes(m, hb.toBytes)
      ha.absorb(hb2)
      val (ds, is, n) = ha.sortedAsc
      val got = (0 until n).map(i => (ds(i), is(i)))
      assert(got == oracle(stream, m), s"trial $trial m=$m cut=$cut")
    }
  }

  test("NaN distances order LAST and are evicted first, matching the SQL rank") {
    val h = new DedupTopM(2)
    h.offer(Double.NaN, 7L); h.offer(1.0, 1L); h.offer(2.0, 2L)
    h.offer(Double.NaN, 9L) // full of finite: NaN candidate rejected
    val (ds, is, n) = h.sortedAsc
    assert(n == 2 && is.take(2).toSeq == Seq(1L, 2L) &&
      ds.take(2).toSeq == Seq(1.0, 2.0), s"NaN displaced a finite edge")
    // under-filled: NaN kept but sorted last
    val h2 = new DedupTopM(3)
    h2.offer(Double.NaN, 7L); h2.offer(1.0, 1L)
    val (ds2, is2, n2) = h2.sortedAsc
    assert(n2 == 2 && is2.take(2).toSeq == Seq(1L, 7L) && ds2(1).isNaN,
      "under-filled NaN must sort last")
  }
}
