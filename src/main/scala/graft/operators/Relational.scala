package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator coverage over the TPC-H-ish star schema —
  * demonstrates the general inventory of SURVEY §2.3 (scans, joins,
  * aggregation, windows, semi/anti joins, rollup) with 100 TB-shaped
  * plans: dimension tables broadcast, fact tables shuffle only on
  * aggregation keys, filters pushed to the parquet scan.
  *
  * Float-sum determinism (FIXTURES.md): money columns are 2-decimal
  * doubles; every cross-row SUM casts to DECIMAL first (exact integer
  * arithmetic, order-independent, identical in DuckDB) and converts to
  * DOUBLE only at output. Averages are a single double division of
  * identical operands. Widths chosen so products stay ≤ DECIMAL(38,_)
  * in both engines: price DECIMAL(10,2), rates DECIMAL(4,2).
  */
object Relational {

  private def dec(c: String, p: Int, s: Int) = col(c).cast(DecimalType(p, s))

  /** TPC-H Q1-shaped pricing summary. */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
    val price = dec("l_extendedprice", 10, 2)
    val disc = dec("l_discount", 4, 2)
    val tax = dec("l_tax", 4, 2)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec("l_quantity", 10, 2)).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        (sum(dec("l_quantity", 10, 2)).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(price).cast("double") / count(lit(1))).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-shaped: top 10 highest-revenue orders for a segment.
    * customer is broadcast; lineitem shuffles only on l_orderkey. */
  def topRevenueOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val revenue = dec("l_extendedprice", 10, 2) * (lit(1) - dec("l_discount", 4, 2))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped: revenue per nation (region→nation→customer→
    * orders→lineitem chain; all dimensions broadcast). */
  def revenuePerNation(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val revenue = dec("l_extendedprice", 10, 2) * (lit(1) - dec("l_discount", 4, 2))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(revenue).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** TPC-H Q14-shaped: monthly revenue share of PROMO-type parts.
    * part is broadcast; lineitem shuffles only on the month key after
    * map-side partial aggregation. Both sums are decimal-exact; the
    * share is one double expression over identical operands. */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
    val revenue = dec("l_extendedprice", 10, 2) * (lit(1) - dec("l_discount", 4, 2))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0).cast(DecimalType(10, 2))))
          .cast("double").as("promo_revenue"),
        sum(revenue).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
      .orderBy(col("month"))
  }

  /** TPC-H Q15-shaped: top-10 suppliers by quarterly revenue
    * (ship-date-filtered at the scan, supplier broadcast). */
  def topSuppliers(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    val revenue = dec("l_extendedprice", 10, 2) * (lit(1) - dec("l_discount", 4, 2))
    li.groupBy(col("l_suppkey"))
      .agg(sum(revenue).cast("double").as("total_revenue"), count(lit(1)).as("n_items"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("suppkey"), col("s_name"),
        col("total_revenue"), col("n_items"))
      .orderBy(col("total_revenue").desc, col("suppkey"))
      .limit(k)
  }

  /** Window: top-3 orders by totalprice per customer. */
  /** Distribution-rank windows — `percent_rank` and `cume_dist`, the
    * last two standard window functions the suite didn't exercise:
    * each order placed within its priority class by relative price
    * position. Both are rational ((rank−1)/(n−1), count≤/n — single
    * integer divisions), so the doubles hash-match the oracle. Ties
    * on price are REAL here (both functions are tie-sensitive by
    * definition); the declared sort tie-breaks on the key so row
    * order is still deterministic. */
  def orderRankDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  def customerTopOrders(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Anti join: customers with no orders. */
  def customersNoOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  /** Rollup over (status, priority) with explicit null ordering so the
    * grouping-set totals land identically in both engines. */
  def ordersRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec("o_totalprice", 12, 2)).cast("double").as("total"))
      .orderBy(
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** CUBE over (status, priority) — all four grouping sets in one
    * pass, disambiguated by the grouping_id bitmask (MSB = first
    * grouping column in both engines). Same partial+final hash-agg
    * shape as [[ordersRollup]]: the fact table shuffles once on the
    * widest grouping set; coarser sets aggregate the reduced rows. */
  def ordersCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(dec("o_totalprice", 12, 2)).cast("double").as("total"))
      .orderBy(
        col("gid"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Navigation + distribution window functions: per customer, order
    * sequence number, days since the previous order (lag + datediff)
    * and the ntile(4) spend quartile — one shuffle on the customer,
    * all three windows share the same sorted run. */
  def customerOrderGaps(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("order_seq", row_number().over(w))
      .withColumn("gap_days", datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  /** Exact grouped quantiles (sort-based `percentile`, linearly
    * interpolated). Rounded to 4 dp: Spark computes (1−g)·a + g·b,
    * DuckDB a + (b−a)·g — algebraically equal, ±1 ulp apart; the
    * quantile grid of 2-decimal inputs sits far from the 4 dp rounding
    * boundary, so both engines round identically. */
  def orderPriceQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("round(percentile(o_totalprice, 0.25D), 4)").as("q25"),
        expr("round(percentile(o_totalprice, 0.5D), 4)").as("q50"),
        expr("round(percentile(o_totalprice, 0.75D), 4)").as("q75"))
      .orderBy(col("o_orderstatus"))

  /** Pivot: per-user event-type counts as columns (integer, dense). */
  def userEventPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Set operators: nations with customers but no suppliers (EXCEPT)
    * and nations with both (INTERSECT), tagged and unioned. */
  def nationPresence(s: SparkSession, d: String): DataFrame = {
    val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nk")).distinct()
    val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
    val both = custNations.intersect(suppNations).withColumn("presence", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("presence", lit("customers_only"))
    both.union(custOnly)
      .join(broadcast(Tables.nation(s, d)), col("nk") === col("n_nationkey"))
      .select(col("nk"), col("n_name"), col("presence"))
      .orderBy(col("presence"), col("nk"))
  }

  /** FULL OUTER join — the one join type the suite didn't yet declare:
    * per-nation customer counts against per-nation supplier counts,
    * keeping nations present on either side (the merged key is the
    * coalesced join column). Both inputs are pre-aggregated to ≤25
    * rows, so the outer join is a broadcast-scale merge of partial
    * aggregates — the reconciliation-report shape. */
  def nationActivity(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val p = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(p, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nation_activity"     -> ((s, d) => nationActivity(s, d)),
    "nation_presence"     -> ((s, d) => nationPresence(s, d)),
    "order_price_quantiles" -> ((s, d) => orderPriceQuantiles(s, d)),
    "user_event_pivot"    -> ((s, d) => userEventPivot(s, d)),
    "pricing_summary"     -> ((s, d) => pricingSummary(s, d)),
    "top_revenue_orders"  -> ((s, d) => topRevenueOrders(s, d)),
    "revenue_per_nation"  -> ((s, d) => revenuePerNation(s, d)),
    "customer_top_orders" -> ((s, d) => customerTopOrders(s, d)),
    "order_rank_dist"     -> ((s, d) => orderRankDist(s, d)),
    "customers_no_orders" -> ((s, d) => customersNoOrders(s, d)),
    "orders_rollup"       -> ((s, d) => ordersRollup(s, d)),
    "orders_cube"         -> ((s, d) => ordersCube(s, d)),
    "customer_order_gaps" -> ((s, d) => customerOrderGaps(s, d)),
    "promo_revenue"       -> ((s, d) => promoRevenue(s, d)),
    "top_suppliers"       -> ((s, d) => topSuppliers(s, d))
  )

  val oracles: Map[String, String] = Map(
    "nation_activity" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
        |           FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        |      FROM supplier GROUP BY 1)
        |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(n_customers, 0) AS n_customers,
        |  coalesce(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
        |ORDER BY nationkey""".stripMargin,
    "nation_presence" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier),
        |tagged AS (
        |  SELECT nk, 'both' AS presence FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |  UNION ALL
        |  SELECT nk, 'customers_only' AS presence FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn))
        |SELECT nk, n_name, presence FROM tagged JOIN nation ON nk = n_nationkey
        |ORDER BY presence, nk""".stripMargin,
    "order_price_quantiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS q25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS q50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS q75
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "user_event_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "top_revenue_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "revenue_per_nation" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "order_rank_dist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pr,
        |  cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "customer_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "customers_no_orders" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "orders_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "orders_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "top_suppliers" ->
      """SELECT l_suppkey AS suppkey, s_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |GROUP BY l_suppkey, s_name
        |ORDER BY total_revenue DESC, suppkey LIMIT 10""".stripMargin,
    "promo_revenue" ->
      """SELECT date_trunc('month', l_shipdate) AS month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |        ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
        |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |        ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY month""".stripMargin,
    "customer_order_gaps" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  row_number() OVER w AS order_seq,
        |  CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |                 CAST(o_orderdate AS DATE)) AS INT) AS gap_days,
        |  ntile(4) OVER w AS quartile
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin
  )
}
