package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scan, filter/project, joins, aggregates, tiered CASE,
  * weekly rollups, semantic-view classification.
  *
  * Re-expresses the reference's staging/gold SQL surface
  * (reference: dbt_bio_lakehouse/models/staging/stg_sleep.sql:1-8,
  * models/gold/gold_daily_rollup.sql:10-80, models/analytics/weekly_summary.sql,
  * athena/views.sql:86-191, macros/tss_calculation.sql:11-32) as declarative
  * DataFrame plans: filters/projections reach the parquet scan via Catalyst
  * pushdown, dimension joins are broadcast, aggregates are partial
  * (map-side combine) by construction.
  */
object Relational {

  /** q01: parquet scan + groupBy sum/avg/min/max/count.
    * Scale: partial aggregation over a low-cardinality key — shuffle carries
    * only per-partition partials. Filter is pushed to the scan.
    */
  def q01ScanAgg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.sumD(col("l_quantity")).as("sum_qty"),
        Num.sumD(col("l_extendedprice")).as("sum_base_price"),
        Num.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Num.avgD(col("l_quantity")).as("avg_qty"),
        Num.roundD(min(col("l_extendedprice"))).as("min_price"),
        Num.roundD(max(col("l_extendedprice"))).as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Num.sqlSum("l_quantity")} AS sum_qty,
       |  ${Num.sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${Num.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${Num.sqlAvg("l_quantity")} AS avg_qty,
       |  ${Num.sqlRoundD("MIN(l_extendedprice)")} AS min_price,
       |  ${Num.sqlRoundD("MAX(l_extendedprice)")} AS max_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: filter + projection/rename/cast (staging-model shape,
    * reference: stg_sleep.sql:1-8, stg_peloton_workouts.sql).
    * Scale: both the predicate and the 4-column projection reach the scan
    * (PushedFilters + pruned ReadSchema) — no full-width read.
    */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
      .select(
        col("o_orderkey").as("order_id"),
        round(col("o_totalprice"), 2).as("total_price"),
        upper(col("o_orderpriority")).as("priority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("order_id")
  }

  val q02Sql: String =
    """SELECT o_orderkey AS order_id,
      |  ROUND(o_totalprice, 2) AS total_price,
      |  UPPER(o_orderpriority) AS priority,
      |  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0
      |ORDER BY order_id""".stripMargin

  /** q03: fact ⋈ small dim with explicit broadcast + aggregate
    * (reference: gold_daily_rollup.sql joins of small staged sources).
    * Scale: nation is O(25) rows at any SF — broadcast avoids shuffling the
    * customer side entirely.
    */
  def q03JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_customers"),
        Num.sumD(col("c_acctbal")).as("total_acctbal"),
        Num.avgD(col("c_acctbal")).as("avg_acctbal"))
      .orderBy("nation")
  }

  val q03Sql: String =
    s"""SELECT n_name AS nation,
       |  COUNT(*) AS n_customers,
       |  ${Num.sqlSum("c_acctbal")} AS total_acctbal,
       |  ${Num.sqlAvg("c_acctbal")} AS avg_acctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY nation""".stripMargin

  /** q04: 5-way join region⋈nation⋈customer⋈orders⋈lineitem + agg
    * (reference: gold_daily_rollup.sql:10-55 multi-source CTE join; shape of
    * TPC-H Q5). Scale: region/nation/customer broadcast progressively;
    * orders⋈lineitem is the only real shuffle, on the join key.
    */
  def q04MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(s, dir, "region").filter(col("r_name").isin("ASIA", "EUROPE"))
    val n = Tables.load(s, dir, "nation")
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
    val l = Tables.load(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        Num.sumD(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("nation")
  }

  val q04Sql: String =
    s"""SELECT n_name AS nation,
       |  ${Num.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_lineitems
       |FROM region
       |  JOIN nation ON n_regionkey = r_regionkey
       |  JOIN customer ON c_nationkey = n_nationkey
       |  JOIN orders ON o_custkey = c_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE r_name IN ('ASIA', 'EUROPE')
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |GROUP BY n_name
       |ORDER BY nation""".stripMargin

  /** q05: tiered CASE with LEAST/GREATEST/COALESCE null handling
    * (reference: macros/tss_calculation.sql:11-32 — 5-tier effort score).
    * Scale: pure row-local expression, whole-stage-codegen'd, no shuffle
    * except the final deterministic sort.
    */
  def q05CaseTiers(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val effort = when(col("l_returnflag") === "R", lit(0.0))
      .when(col("l_quantity") > 40,
        least(lit(300.0), col("l_extendedprice") * coalesce(col("l_tax"), lit(0.04)) / 6.0))
      .when(col("l_quantity") > 20 && col("l_discount") > 0,
        least(lit(300.0), col("l_extendedprice") * col("l_discount") / 1.5))
      .when(col("l_extendedprice") > 0,
        least(lit(200.0), col("l_extendedprice") / 12.0))
      .otherwise(lit(0.0))
    l.select(
        col("l_orderkey"), col("l_linenumber"),
        Num.roundD(greatest(lit(0.0), effort)).as("effort_score"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val q05Sql: String =
    s"""SELECT l_orderkey, l_linenumber,
       |  ${Num.sqlRoundD("""GREATEST(0.0, CASE
      |    WHEN l_returnflag = 'R' THEN 0.0
      |    WHEN l_quantity > 40 THEN LEAST(300.0, l_extendedprice * COALESCE(l_tax, 0.04) / 6.0)
      |    WHEN l_quantity > 20 AND l_discount > 0 THEN LEAST(300.0, l_extendedprice * l_discount / 1.5)
      |    WHEN l_extendedprice > 0 THEN LEAST(200.0, l_extendedprice / 12.0)
      |    ELSE 0.0 END)""")} AS effort_score
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q06: date_trunc weekly rollup + LAG week-over-week deltas + trend CASE
    * (reference: analytics/weekly_summary.sql — WoW change + trend label).
    * Scale: the unpartitioned LAG window runs AFTER aggregation to weekly
    * grain (~52 rows/year), so the single-partition window is bounded and
    * safe at any input size; the heavy lifting is the partial groupBy.
    */
  def q06WeeklySummary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(s, dir, "orders")
    val weekly = o
      .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"))
      .agg(
        Num.sumD(col("o_totalprice"), 2).as("weekly_revenue"),
        count(lit(1)).as("order_count"),
        Num.roundD(Num.exactSum(col("o_totalprice")).cast("double") / count(lit(1)), 2)
          .as("avg_order_price"))
    val w = Window.orderBy("week_start")
    weekly
      .withColumn("revenue_change", Num.roundD(col("weekly_revenue") - lag("weekly_revenue", 1).over(w), 2))
      .withColumn("order_count_change", col("order_count") - lag("order_count", 1).over(w))
      .withColumn("trend",
        when(lag("weekly_revenue", 1).over(w).isNull, "n/a")
          .when(col("weekly_revenue") > lag("weekly_revenue", 1).over(w) &&
                col("order_count") > lag("order_count", 1).over(w), "improving")
          .when(col("weekly_revenue") < lag("weekly_revenue", 1).over(w) &&
                col("order_count") < lag("order_count", 1).over(w), "declining")
          .when(col("weekly_revenue") < lag("weekly_revenue", 1).over(w), "overreaching")
          .when(col("weekly_revenue") > lag("weekly_revenue", 1).over(w), "recovering")
          .otherwise("stable"))
      .orderBy("week_start")
  }

  val q06Sql: String =
    s"""WITH weekly AS (
       |  SELECT STRFTIME(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
       |    ${Num.sqlSum("o_totalprice", 2)} AS weekly_revenue,
       |    COUNT(*) AS order_count,
       |    ${Num.sqlRoundD("CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)", 2)} AS avg_order_price
       |  FROM orders GROUP BY 1)
       |SELECT week_start, weekly_revenue, order_count, avg_order_price,
       |  ${Num.sqlRoundD("weekly_revenue - LAG(weekly_revenue, 1) OVER w", 2)} AS revenue_change,
       |  order_count - LAG(order_count, 1) OVER w AS order_count_change,
       |  CASE
       |    WHEN LAG(weekly_revenue, 1) OVER w IS NULL THEN 'n/a'
       |    WHEN weekly_revenue > LAG(weekly_revenue, 1) OVER w
       |         AND order_count > LAG(order_count, 1) OVER w THEN 'improving'
       |    WHEN weekly_revenue < LAG(weekly_revenue, 1) OVER w
       |         AND order_count < LAG(order_count, 1) OVER w THEN 'declining'
       |    WHEN weekly_revenue < LAG(weekly_revenue, 1) OVER w THEN 'overreaching'
       |    WHEN weekly_revenue > LAG(weekly_revenue, 1) OVER w THEN 'recovering'
       |    ELSE 'stable' END AS trend
       |FROM weekly
       |WINDOW w AS (ORDER BY week_start)
       |ORDER BY week_start""".stripMargin

  /** q07: semantic-view classification — multi-factor CASE over joined
    * per-customer aggregates (reference: athena/views.sql:86-191
    * energy_state / overtraining_risk views).
    * Scale: per-customer agg shuffles on o_custkey once; the classification
    * is row-local; final output is segment×state (tiny).
    */
  def q07SemanticView(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val custOrders = o.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        Num.exactSum(col("o_totalprice")).cast("double").as("spend"),
        max(col("o_orderdate")).as("last_order"))
    val state = when(col("o_custkey").isNull, "dormant")
      .when(col("spend") > 300000.0 && col("n_orders") >= 12, "high_value")
      .when(col("spend") > 150000.0 || col("n_orders") >= 8, "engaged")
      .when(col("last_order") < lit("1998-01-01").cast("timestamp"), "lapsed")
      .otherwise("standard")
    c.join(custOrders, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment").as("segment"), state.as("customer_state"), col("spend"))
      .groupBy("segment", "customer_state")
      .agg(
        count(lit(1)).as("n_customers"),
        Num.sumD(coalesce(col("spend"), lit(0.0)), 2).as("segment_spend"))
      .orderBy("segment", "customer_state")
  }

  /** q34: ROLLUP hierarchy totals — order revenue by (year, priority)
    * with subtotal and grand-total rows (reference: the dashboard views
    * aggregate at multiple grains — daily, weekly, all-time — which a
    * single ROLLUP pass serves). Null grouping keys are labeled 'ALL' so
    * both engines emit identical rows. One shuffle; Spark expands the
    * grouping sets map-side.
    */
  def q34Rollup(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    o.withColumn("order_year", year(col("o_orderdate")))
      .rollup(col("order_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), Num.sumD(col("o_totalprice"), 2).as("revenue"))
      .select(
        coalesce(col("order_year").cast("string"), lit("ALL")).as("order_year"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy("order_year", "priority")
  }

  val q34Sql: String =
    s"""SELECT COALESCE(CAST(order_year AS VARCHAR), 'ALL') AS order_year,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n_orders,
       |  ${Num.sqlSum("o_totalprice", 2)} AS revenue
       |FROM (SELECT *, year(o_orderdate) AS order_year FROM orders) t
       |GROUP BY ROLLUP(order_year, o_orderpriority)
       |ORDER BY order_year, priority""".stripMargin

  /** q36: CUBE cross-dimensional totals — event counts and value sums for
    * every (event_type × weekday) combination plus all marginals in one
    * pass (the other half of the grouping-sets family next to q34's
    * ROLLUP).
    */
  def q36Cube(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    e.withColumn("dow", dayofweek(col("ts")))
      .cube(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_events"), Num.sumD(col("value"), 2).as("total_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("dow").cast("string"), lit("ALL")).as("dow"),
        col("n_events"), col("total_value"))
      .orderBy("event_type", "dow")
  }

  val q36Sql: String =
    s"""SELECT COALESCE(event_type, 'ALL') AS event_type,
       |  COALESCE(CAST(dow AS VARCHAR), 'ALL') AS dow,
       |  COUNT(*) AS n_events,
       |  ${Num.sqlSum("value", 2)} AS total_value
       |FROM (SELECT *, dayofweek(ts) + 1 AS dow FROM events) t
       |GROUP BY CUBE(event_type, dow)
       |ORDER BY event_type, dow""".stripMargin

  /** q37: ranking-function suite — NTILE quartiles, PERCENT_RANK and
    * DENSE_RANK over per-customer spend within each market segment
    * (the classic cohort-ranking shape; complements the ROW_NUMBER dedup
    * in q10). Total tiebreak (spend, custkey) keeps ranks deterministic
    * cross-engine.
    */
  def q37Ranking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val spend = o.groupBy("o_custkey")
      .agg(Num.sumD(col("o_totalprice"), 2).as("spend"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("spend").desc, col("c_custkey"))
    c.join(spend, col("c_custkey") === col("o_custkey"))
      .select(
        col("c_mktsegment").as("segment"), col("c_custkey").as("custkey"),
        col("spend"),
        ntile(4).over(w).as("spend_quartile"),
        Num.roundD(percent_rank().over(w)).as("pct_rank"),
        dense_rank().over(w).as("drank"))
      .orderBy("segment", "custkey")
  }

  val q37Sql: String =
    s"""WITH spend AS (
       |  SELECT o_custkey, ${Num.sqlSum("o_totalprice", 2)} AS spend
       |  FROM orders GROUP BY o_custkey)
       |SELECT c_mktsegment AS segment, c_custkey AS custkey, spend,
       |  NTILE(4) OVER w AS spend_quartile,
       |  ${Num.sqlRoundD("PERCENT_RANK() OVER w")} AS pct_rank,
       |  DENSE_RANK() OVER w AS drank
       |FROM customer JOIN spend ON c_custkey = o_custkey
       |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC, c_custkey)
       |ORDER BY segment, custkey""".stripMargin

  val q07Sql: String =
    s"""WITH cust_orders AS (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS spend,
       |    MAX(o_orderdate) AS last_order
       |  FROM orders GROUP BY o_custkey)
       |SELECT segment, customer_state, COUNT(*) AS n_customers,
       |  ${Num.sqlSum("COALESCE(spend, 0.0)", 2)} AS segment_spend
       |FROM (
       |  SELECT c.c_mktsegment AS segment,
       |    CASE WHEN co.o_custkey IS NULL THEN 'dormant'
       |         WHEN co.spend > 300000.0 AND co.n_orders >= 12 THEN 'high_value'
       |         WHEN co.spend > 150000.0 OR co.n_orders >= 8 THEN 'engaged'
       |         WHEN co.last_order < TIMESTAMP '1998-01-01' THEN 'lapsed'
       |         ELSE 'standard' END AS customer_state,
       |    co.spend AS spend
       |  FROM customer c LEFT JOIN cust_orders co ON c.c_custkey = co.o_custkey) t
       |GROUP BY segment, customer_state
       |ORDER BY segment, customer_state""".stripMargin
}
