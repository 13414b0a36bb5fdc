package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventsOps, TextOps}

/** Behavioral cross-checks for the events operators that re-express a
  * join the naive way would explode: each scalable plan is proven
  * row-identical to its quadratic reference form in-test (the DuckDB
  * oracle re-proves the same equivalence engine-independently). */
class EventsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("events-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val d = "/root/testdata/sf0.001"

  test("asof join ≡ naive theta-join + per-event top-1") {
    val ev = Tables.events(spark, d).select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(spark, d)
    val w = Window.partitionBy("event_id")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val naive = ev
      .join(ord,
        ord("o_custkey") === ev("user_id") && ord("o_orderdate") <= ev("ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey").as("ord_key"), col("o_totalprice").as("ord_price"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val fast = EventsOps.asofOrderJoin(spark, d)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(fast.length == naive.length)
    assert(fast.toSeq == naive.toSeq)
  }

  test("rolling 1h window ≡ naive range self-join") {
    val hourUs = 3600L * 1000000L
    val e = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value").cast(DecimalType(18, 6)).as("dv"))
    val naive = e.as("a")
      .join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.us") >= col("a.us") - hourUs && col("b.us") <= col("a.us"))
      .groupBy(col("a.event_id").as("event_id"))
      .agg(sum(col("b.dv")).cast("double").as("roll_sum"),
        count(lit(1)).as("roll_n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    val fast = EventsOps.rollingUserValue(spark, d)
      .select(col("event_id"), col("roll_sum"), col("roll_n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(fast.toSeq == naive.toSeq)
  }

  test("dedup_clusters: labels are exactly min-of-component") {
    val dd = "/root/testdata/sf0.01" // sf0.001 has no J≥0.5 pairs
    val labels = TextOps.dedupClusters(spark, dd)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = labels.map(l => l._1 -> l._2).toMap
    // every near-dup pair lands in one cluster
    val pairs = TextOps.jaccardPairs(spark, dd)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs; test is vacuous")
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split across clusters")
    }
    // the label is the min doc_id of the cluster, sizes are consistent,
    // and the assignment covers every document exactly once
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid not labeled by its min")
      assert(members.forall(_._3 == members.length), s"cluster $cid size wrong")
    }
    assert(labels.length == Tables.documents(spark, dd).count())
    // transitive closure check: clusters agree with a driver-side
    // union-find over the same pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    labels.foreach { case (doc, cid, _) =>
      val expected = if (parent.contains(doc) || pairs.exists(p => p._1 == doc || p._2 == doc))
        find(doc) else doc
      assert(cid == expected, s"doc $doc: cluster $cid != union-find $expected")
    }
  }

  test("tfidf_topk: ranks are dense per doc and scores non-increasing") {
    val rows = TextOps.tfidfTopk(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to rs.length).toSeq, s"doc $doc ranks not dense")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted(Ordering[Double].reverse).toSeq,
        s"doc $doc scores increase with rank")
    }
    assert(rows.forall { case (_, tf, df, _, _) => tf >= 1 && df >= 1 })
  }
}
