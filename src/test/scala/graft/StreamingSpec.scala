package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming behavior: bounded-stream equivalence with batch results,
  * and stateful sessionization across micro-batches. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamingHourly equals the batch hourly aggregation") {
    val d = "/root/testdata/sf0.001"
    val stream = StreamingOps.streamingHourly(spark, d).collect()
    val batch = operators.EventsOps.eventsHourly(spark, d)
      .select(col("hour"), col("event_type"), col("n"), col("sum_value"))
      .collect()
    assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    assert(stream.nonEmpty)
  }

  test("watermark: windows finalize in order, late rows are dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)] // (us, type_tag, value)
    val events = mem.toDF()
      .select(expr("timestamp_micros(_1)").as("ts"),
        concat(lit("t"), col("_2")).as("event_type"), col("_3").as("value"))
    val out = graft.streaming.StreamingOps.lateHourlyAgg(events, "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_test").start()
    def table() = spark.table("late_test")
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    val min = 60L * 1000000L
    // batch 1: hour 0 gets 2 rows, then an hour-1 row advances event
    // time to 01:30 -> watermark (01:20) passes hour 0's end
    mem.addData((5 * min, 1L, 1.0), (10 * min, 1L, 2.0), (90 * min, 1L, 4.0))
    q.processAllAvailable()
    // batch 2: a LATE hour-0 row (ts 00:20 < watermark) must be
    // dropped, not resurrect the finalized window
    mem.addData((20 * min, 1L, 100.0))
    q.processAllAvailable()
    // batch 3: advance far enough to finalize hour 1 too
    mem.addData((200 * min, 1L, 8.0))
    q.processAllAvailable()
    val rows = table()
    assert(rows.map(x => (x._1, x._2, x._3, x._4)).toSeq == Seq(
      (0L, "t1", 2L, 3.0),                 // late 100.0 NOT included
      (3600L * 1000, "t1", 1L, 4.0)))      // hour 1 finalized by batch 3
    q.stop()
  }

  test("streamingSessionize closes sessions across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, us)
    val events = mem.toDF()
      .select(col("_1").as("user_id"), expr("timestamp_micros(_2)").as("ts"))
    val out = StreamingOps.streamingSessionize(spark, events)
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_test").start()

    val min = 60L * 1000000L
    // batch 1: user 1 has two events 5 min apart (one open session)
    mem.addData((1L, 0L), (1L, 5 * min))
    q.processAllAvailable()
    assert(spark.table("sess_test").count() == 0) // nothing closed yet

    // batch 2: 45 min later -> gap closes session 1 (2 events, 5 min)
    mem.addData((1L, 50 * min))
    q.processAllAvailable()
    val closed = spark.table("sess_test").as[StreamingOps.SessionOut].collect()
    assert(closed.toSeq == Seq(StreamingOps.SessionOut(1L, 1L, 2L, 5 * min)))

    // batch 3: another user, immediate gap close after two bursts
    mem.addData((2L, 0L), (2L, 40 * min))
    q.processAllAvailable()
    val all = spark.table("sess_test").as[StreamingOps.SessionOut].collect()
    assert(all.length == 2)
    assert(all.exists(o => o.user_id == 2L && o.n_events == 1L))

    // batch 4+5: a cross-batch OUT-OF-ORDER event inside the current
    // session must not rewind the frontier. User 3: frontier at 60min;
    // a late 45min event arrives (inside the session), then an 88min
    // event — 88-60=28min <= gap, so NO split. A rewound frontier
    // (lastUs=45) would see 88-45=43min > gap and falsely close.
    mem.addData((3L, 30 * min), (3L, 60 * min))
    q.processAllAvailable()
    mem.addData((3L, 45 * min))
    q.processAllAvailable()
    mem.addData((3L, 88 * min))
    q.processAllAvailable()
    val u3closed = spark.table("sess_test").as[StreamingOps.SessionOut]
      .collect().filter(_.user_id == 3L)
    assert(u3closed.isEmpty,
      s"out-of-order event rewound the session frontier: ${u3closed.mkString(",")}")
    // close it and pin the accounting: 4 events, duration 88-30 min
    mem.addData((3L, 200 * min))
    q.processAllAvailable()
    val u3 = spark.table("sess_test").as[StreamingOps.SessionOut]
      .collect().filter(_.user_id == 3L)
    assert(u3.toSeq == Seq(StreamingOps.SessionOut(3L, 1L, 4L, 58 * min)),
      s"session accounting wrong: ${u3.mkString(",")}")
    q.stop()
  }

  test("stream-stream interval join buffers state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vmem = MemoryStream[(Long, Long, Long)] // (user, view_id, us)
    val pmem = MemoryStream[(Long, Long, Long)] // (user, buy_id, us)
    val views = vmem.toDF()
      .select(col("_1").as("user_id"), col("_2").as("view_id"),
        expr("timestamp_micros(_3)").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val buys = pmem.toDF()
      .select(col("_1").as("buy_user"), col("_2").as("buy_id"),
        expr("timestamp_micros(_3)").as("buy_ts"))
      .withWatermark("buy_ts", "1 hour")
    val joined = views.join(buys,
      col("user_id") === col("buy_user") &&
        col("buy_ts") >= col("view_ts") &&
        col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("view_id"), col("buy_id"))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("join_test").start()
    val min = 60L * 1000000L
    val base = 1700000000L * 1000000L // 2023-11-14, clear of epoch-0 clamps
    vmem.addData((1L, 10L, base)) // batch 1: a view, no purchase yet
    q.processAllAvailable()
    assert(spark.table("join_test").count() == 0)
    pmem.addData((1L, 20L, base + 10 * min)) // batch 2: joins the BUFFERED view
    q.processAllAvailable()
    val rows = spark.table("join_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 10L, 20L)))
    pmem.addData((1L, 21L, base + 50 * min)) // batch 3: outside the 30-min bound
    q.processAllAvailable()
    assert(spark.table("join_test").count() == 1)
    q.stop()
  }

  test("streaming dedup swallows duplicates across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = mem.toDF()
      .select(md5(col("value")).as("content_hash"))
      .dropDuplicates("content_hash")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_test").start()

    mem.addData("doc a", "doc b", "doc a") // in-batch duplicate
    q.processAllAvailable()
    assert(spark.table("dedup_test").count() == 2)

    mem.addData("doc b", "doc c") // cross-batch duplicate vs new key
    q.processAllAvailable()
    val rows = spark.table("dedup_test").collect().map(_.getString(0))
    assert(rows.length == 3)
    assert(rows.distinct.length == 3)
    q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state to the lateness horizon") {
    // the production-bounded variant the declared streaming_dedup's
    // docstring names: duplicates are swallowed only within the
    // watermark horizon — once the watermark passes a key's expiry its
    // state is dropped, so a far-later duplicate of an old key is
    // treated as new (RE-EMITTED). That re-emission is the observable
    // proof the state is bounded (plain dropDuplicates would swallow
    // it forever with O(all keys) state).
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)] // (doc, event-time micros)
    val out = mem.toDF()
      .select(md5(col("_1")).as("content_hash"),
        expr("timestamp_micros(_2)").as("ts"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = out.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_wm_test").start()

    def min(m: Long) = m * 60L * 1000000L
    mem.addData(("doc a", min(0)), ("doc a", min(1)), ("doc b", min(2)))
    q.processAllAvailable()
    assert(spark.table("dedup_wm_test").count() == 2, "within-horizon dup must swallow")

    // advance the watermark far past doc a's expiry, then replay it
    mem.addData(("doc c", min(120)))
    q.processAllAvailable()
    mem.addData(("doc a", min(121)))
    q.processAllAvailable()
    val docAHash = java.security.MessageDigest.getInstance("MD5")
      .digest("doc a".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byKey = spark.table("dedup_wm_test").collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byKey.values.sum == 4, s"expected 4 emissions, got $byKey")
    assert(byKey(docAHash) == 2, "old key re-emitted after its state expired")
    q.stop()
  }

  test("streaming index maintenance: batch-boundary invariant, deduped, ≡ full rebuild") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val deltaIds = Tables.embeddings(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).filter(_ % 10 == 0).sorted
    assert(deltaIds.length >= 9, "fixture delta slice unexpectedly small")
    def run(batches: Seq[Seq[Long]]): Set[(Int, Long, Long, Double)] = {
      val mem = MemoryStream[Long]
      val maint = new StreamingOps.IndexMaintainer(
        spark, d, operators.Ann.ensureBaseIndex(spark, d))
      val q = mem.toDF().select(col("value").as("vec_id"))
        .dropDuplicates("vec_id")
        .writeStream
        .foreachBatch(maint.fold _)
        .start()
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      maint.current.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    }
    val rebuild = operators.Ann.hnswEdges(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // one micro-batch vs three, plus a duplicate arrival the upstream
    // dedup must swallow: every composition lands on the same index,
    // and that index is bitwise the full rebuild
    val oneShot = run(Seq(deltaIds.toSeq))
    val (b1, rest) = deltaIds.splitAt(deltaIds.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val split = run(Seq(b1.toSeq, b2.toSeq :+ b1.head, b3.toSeq))
    assert(oneShot == rebuild, "single-batch fold != full rebuild")
    assert(split == rebuild, "3-batch fold (with dup arrival) != full rebuild")
  }

  test("streaming_join state shards: feed-sized derivation, floor 8, shuffle-parallelism cap") {
    // pins the r11 fix that cut streaming_join 23.3 -> 2.5 s (256
    // delta-commits for 40k rows of state): shards follow feed volume
    // at ~32 MB/shard with floor 8, capped at the session's configured
    // shuffle parallelism — so a future conf change cannot silently
    // restore the per-shard commit tax on small feeds
    val d = "/root/testdata/sf0.001"
    // floor: the tiny fixture feed derives the 8-shard floor
    assert(StreamingOps.stateShards(spark, d, "events") == 8,
      "small-feed floor moved")
    // bytes-derived: a 320 MB feed is 10 shards (sparse file — the
    // derivation reads only file LENGTH, never content)
    val tmp = java.nio.file.Files.createTempDirectory("graft_shards").toFile
    val big = new java.io.RandomAccessFile(
      new java.io.File(tmp, "events.parquet"), "rw")
    try big.setLength(320L << 20) finally big.close()
    try {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      // uncapped regime (cap 64 > derived 10): pure 32 MB/shard math
      spark.conf.set(key, "64")
      try assert(StreamingOps.stateShards(spark, tmp.getPath, "events") == 10,
        "32 MB/shard derivation moved")
      finally spark.conf.set(key, prev)
      // cap: configured shuffle parallelism is authoritative — for the
      // derived count AND the floor (a 4-thread session gets 4 shards)
      spark.conf.set(key, "4")
      try {
        assert(StreamingOps.stateShards(spark, tmp.getPath, "events") == 4,
          "cap does not bound the derived count")
        assert(StreamingOps.stateShards(spark, d, "events") == 4,
          "cap does not bound the floor")
      } finally spark.conf.set(key, prev)
    } finally {
      new java.io.File(tmp, "events.parquet").delete()
      tmp.delete()
    }
  }
}

/** Multimodal plumbing: schema, batching, determinism, ANN handoff. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("multimodal-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val d = "/root/testdata/sf0.001"

  test("features: fixed dim, deterministic across runs, batched") {
    val f1 = multimodal.Multimodal.features(spark, d).orderBy("doc_id").collect()
    val f2 = multimodal.Multimodal.features(spark, d).orderBy("doc_id").collect()
    assert(f1.length == 500)
    assert(f1.forall(_.getSeq[Float](1).length == 16))
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
  }

  test("decoded-grid features: 48 integer dims per doc, consistent with image_grid") {
    val f = multimodal.Multimodal.featuresExploded(spark, d)
    val counts = f.groupBy("doc_id").count()
      .select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSeq == Seq(48L),
      s"expected exactly 48 feature rows per doc: ${counts.mkString(",")}")
    // pos (gy*4+gx)*3 + channel must restate image_grid's cell sums
    val g = multimodal.Multimodal.imageGrid(spark, d)
      .filter(col("doc_id") === 0 && col("gy") === 0 && col("gx") === 0)
      .collect().head
    val p0 = f.filter(col("doc_id") === 0 && col("pos") === 0).collect().head
    assert(p0.getLong(2) == g.getLong(3),
      s"features pos 0 (${p0.getLong(2)}) != image_grid (0,0) sum_r (${g.getLong(3)})")
  }

  test("audio-band knn: the query document ranks itself first at distance 0") {
    val res = multimodal.Multimodal.multimodalKnn(spark, d).collect()
    assert(res.length == 10)
    assert(res.head.getLong(0) == 0L && res.head.getLong(1) == 0L,
      s"doc 0 must be its own nearest neighbor at distance 0: ${res.head}")
  }

  test("extracted features feed the exact k-NN operator") {
    val feats = multimodal.Multimodal.features(spark, d)
      .select(col("doc_id").as("vec_id"), col("feature").cast("array<double>").as("embedding"))
    val q = feats.filter(col("vec_id") < 3)
    val res = operators.BroadcastKnnJoin(spark, feats, q, 5)
      .orderBy(col("query_id"), col("rnk")).collect()
    assert(res.length == 15)
    // self is always rank 1 at distance 0
    assert(res.filter(_.getInt(3) == 1).forall(r => r.getLong(0) == r.getLong(1)))
  }

}
