package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Attribution for `streaming_join`'s bench cost (VERDICT r10 task 5):
  * is the 12–23 s at sf0.1 the PLAN (the interval join's work) or the
  * HARNESS (micro-batch machinery — state-store commit, WAL, offset
  * log, per-batch planning)?
  *
  * Prints, for each of N repetitions:
  *   - total wall seconds of the streaming query,
  *   - the micro-batch count and the per-batch duration breakdown
  *     Structured Streaming itself reports (`addBatch` = plan
  *     execution, `getBatch`/`latestOffset` = source, `walCommit` +
  *     `stateCommit`-adjacent = harness persistence),
  *   - wall seconds of the IDENTICAL join run as a plain batch query
  *     (same predicates, no state store) — the plan-cost floor.
  *
  * Run: sbt -batch "runMain graft.tools.StreamingJoinAttribution
  *        /root/testdata/sf0.1 3"
  */
object StreamingJoinAttribution {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("streaming-join-attribution")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the batch twin: identical predicates, no watermarks or state
    def batchJoin(): Long = {
      val src = graft.Tables.events(spark, d)
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
          col("value"), col("ts").as("buy_ts"))
      views.join(buys,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        .count()
    }

    def streamRun(tag: String, maxFilesPerTrigger: Option[Int]): Unit = {
      val t0 = System.nanoTime()
      val path = s"$d/events.parquet"
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(path).schema
      val rawBase = spark.readStream.schema(schema)
      val withOpt = maxFilesPerTrigger
        .map(n => rawBase.option("maxFilesPerTrigger", n)).getOrElse(rawBase)
      val raw =
        if (new java.io.File(path).isDirectory) withOpt.parquet(path)
        else withOpt.option("pathGlobFilter", "events.parquet").parquet(d)
      val src = raw.transform(graft.Tables.normalizeTs)
      val views = src.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
        .withWatermark("view_ts", "1 hour")
      val buys = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
          col("value"), col("ts").as("buy_ts"))
        .withWatermark("buy_ts", "1 hour")
      val joined = views.join(buys,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("view_id"), col("buy_id"), col("value"))
      val name = "sj_attr_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = joined.writeStream
        .outputMode(OutputMode.Append)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(name).count()
      val progress = q.recentProgress
      println(f"[$tag] wall=$wall%.2f s rows=$rows microBatches=${progress.length}")
      progress.zipWithIndex.foreach { case (p, i) =>
        val dm = p.durationMs
        val keys = dm.keySet().toArray(Array.empty[String]).sorted
        val parts = keys.map(k => s"$k=${dm.get(k)}").mkString(" ")
        println(s"[$tag]   batch $i: inputRows=${p.numInputRows} $parts")
        p.stateOperators.foreach { so =>
          println(s"[$tag]     state: rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} commitMs=${so.commitTimeMs} " +
            s"memUsedBytes=${so.memoryUsedBytes}")
        }
      }
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }

    (1 to reps).foreach { r =>
      val tb0 = System.nanoTime()
      val n = batchJoin()
      println(f"[batch-twin rep $r] wall=${(System.nanoTime() - tb0) / 1e9}%.2f s rows=$n")
      streamRun(s"stream rep $r", None)
    }
    spark.stop()
  }
}
