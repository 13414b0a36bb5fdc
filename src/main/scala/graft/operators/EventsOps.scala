package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Time-series / JSON / sessionization operators over the `events`
  * table — the batch expression of the streaming-analytics surface
  * (the same aggregations run under Structured Streaming in
  * [[graft.streaming.StreamingOps]]; keeping them batch here makes
  * them DuckDB-oracle-checkable, per SURVEY §2.3).
  *
  * Scale: hourly aggregation shuffles on (hour, type) with map-side
  * partial aggregation; sessionization shuffles once on user_id and
  * then is two window passes over time-sorted per-user runs — the
  * canonical "gap > threshold" sessionizer. value sums go through
  * DECIMAL(18,6) for order-independent determinism.
  */
object EventsOps {

  /** Hourly per-type counts and value sums. */
  def eventsHourly(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"),
        (sum(col("value").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("avg_value"))
      .orderBy(col("hour"), col("event_type"))

  /** JSON property extraction + per-type stats over props.k. */
  def eventsJsonStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        (sum(col("k")).cast("double") / count(lit(1))).as("avg_k"))
      .orderBy(col("event_type"))

  /** Gap-based sessionization (30-minute inactivity): one shuffle on
    * user_id, lag + cumulative-sum windows, then per-session rollup. */
  def sessionize(s: SparkSession, d: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
    val byUser = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val flagged = e.withColumn(
      "new_session",
      when(col("us") - lag(col("us"), 1).over(byUser) > gapUs, 1)
        .otherwise(when(lag(col("us"), 1).over(byUser).isNull, 1).otherwise(0)))
    val sessions = flagged.withColumn(
      "session_id",
      sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** As-of join — for every event, the latest order of the same
    * customer at or before the event time (ties on equal order date
    * broken by max orderkey). Spark has no ASOF JOIN operator; the
    * naive form (theta-join on `t <= ts` + per-event top-1) explodes
    * to |events|·|orders-per-user| rows before pruning. This is the
    * scalable re-expression: UNION both tables tagged by side, ONE
    * shuffle on the join key, and a sorted carry-forward window
    * (`last(..., ignoreNulls)` over rows-unbounded-preceding) that
    * pins each event row to the most recent order row sorted before
    * it. Order rows sort before event rows at equal time (inclusive
    * as-of), ascending orderkey makes `last` pick the max-key tie.
    * Cost is sort-merge over |events|+|orders| rows — no pair
    * explosion at any scale; a 1000-executor cluster shuffles each
    * row exactly once. */
  def asofOrderJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orderSide = Tables.orders(s, d).select(
      col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
      lit(1).as("is_order"), col("o_orderkey"), col("o_totalprice"),
      lit(null).cast("long").as("event_id"))
    val eventSide = ev.select(
      col("user_id"), col("ts").as("t"), lit(0).as("is_order"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("is_order").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    orderSide.unionByName(eventSide)
      .withColumn("ord_key",
        last(when(col("is_order") === 1, col("o_orderkey")), ignoreNulls = true).over(w))
      .withColumn("ord_price",
        last(when(col("is_order") === 1, col("o_totalprice")), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        col("ord_key"), col("ord_price"))
      .orderBy(col("event_id"))
  }

  /** Rolling 1-hour per-user value sum/count — a RANGE-frame window
    * over event time (each row aggregates its user's trailing hour).
    * One shuffle on user_id; the frame walks each partition sorted
    * once. Sums go through DECIMAL(18,6): a RANGE frame's contents are
    * order-free sets, so determinism needs the exact accumulator. */
  def rollingUserValue(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"),
        col("value").cast(DecimalType(18, 6)).as("dv"))
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-hourUs, 0)
    e.withColumn("roll_sum", sum(col("dv")).over(w).cast("double"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("roll_sum"), col("roll_n"))
      .orderBy(col("event_id"))
  }

  /** Top-10 users by purchase count (count desc, user asc). */
  def topUsers(s: SparkSession, d: String, k: Int = 10): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .orderBy(col("n_purchases").desc, col("user_id"))
      .limit(k)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_hourly"      -> ((s, d) => eventsHourly(s, d)),
    "events_json_stats"  -> ((s, d) => eventsJsonStats(s, d)),
    "sessionize"         -> ((s, d) => sessionize(s, d)),
    "top_users"          -> ((s, d) => topUsers(s, d)),
    "events_asof_order"  -> ((s, d) => asofOrderJoin(s, d)),
    "rolling_user_value" -> ((s, d) => rollingUserValue(s, d))
  )

  val oracles: Map[String, String] = Map(
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "events_json_stats" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / count(*) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |f AS (SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000 OR lag(us) OVER w IS NULL
        |                     THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  make_timestamp(min(us)) AS session_start, make_timestamp(max(us)) AS session_end,
        |  count(*) AS n_events, max(us) - min(us) AS duration_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "top_users" ->
      """SELECT user_id, count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY n_purchases DESC, user_id LIMIT 10""".stripMargin,
    // oracle is the naive as-of: per event, rank matching orders by
    // (date DESC, orderkey DESC) and keep rank 1 — the quadratic form
    // the engine's union+carry-forward window is proven against
    "events_asof_order" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, ts, o_orderkey AS ord_key,
        |       o_totalprice AS ord_price
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "rolling_user_value" ->
      """WITH e AS (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
        |                  CAST(value AS DECIMAL(18,6)) AS dv FROM events)
        |SELECT event_id, user_id, ts,
        |  CAST(sum(dv) OVER w AS DOUBLE) AS roll_sum,
        |  count(*) OVER w AS roll_n
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )
}
