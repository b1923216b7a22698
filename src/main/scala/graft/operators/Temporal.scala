package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch temporal operators: gap sessionization via the native
  * `session_window` and the as-of temporal lookup as registered,
  * oracle-checked queries. The streaming twins live in
  * [[graft.streaming.EventStreams]] (same session semantics under a
  * watermark); these are the batch/backfill forms.
  */
object Temporal {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** q56: batch sessionization — 30-minute-gap sessions per user via
    * `session_window` (codegen'd session assignment inside the
    * aggregate: one shuffle on user_id, no window-function pass). The
    * oracle replays the identical semantics as ANSI gaps-and-islands
    * (LAG ≥ gap starts an island), machine-checking that Spark's session
    * merge rule — an event exactly at the window end starts a NEW
    * session — matches the `>=` boundary, microsecond-exact.
    */
  def q56SessionizeBatch(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        nullif(count(when(col("event_type") === "purchase", 1)), lit(0L))
          .as("purchases"),
        Num.sumD(col("value"), 2).as("session_value"))
      .select(
        col("user_id"),
        expr("unix_micros(session_window.start)").as("session_start_us"),
        expr("unix_micros(session_window.end)").as("session_end_us"),
        col("n_events"), col("purchases"), col("session_value"))
      .orderBy("user_id", "session_start_us")

  val q56Sql: String =
    s"""WITH o AS (
       |  SELECT user_id, ts, event_type, value,
       |    CASE WHEN LAG(ts) OVER w IS NULL
       |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |si AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM o)
       |SELECT user_id,
       |  epoch_us(MIN(ts)) AS session_start_us,
       |  epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
       |  COUNT(*) AS n_events,
       |  NULLIF(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchases,
       |  ${Num.sqlSum("value", 2)} AS session_value
       |FROM si
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start_us""".stripMargin

  /** q57: as-of temporal lookup as a registered query — each purchase
    * event annotated with the user's most recent view event at or before
    * purchase time ([[AsOf.joinAsOf]]: union-and-carry, ONE shuffle on
    * the key, each row touched once). The oracle is DuckDB's native ASOF
    * LEFT JOIN, machine-checking the inclusive `<=` boundary and the
    * no-earlier-view NULL contract against an independent
    * implementation. View rows pre-aggregate per (user, instant) so
    * neither engine faces a tie.
    */
  def q57AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("purchase_value"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(Num.roundD(max(col("value"))).as("view_value"))
      .withColumn("view_ts_us", expr("unix_micros(ts)"))
      .select(col("user_id"), col("ts"), col("view_value"), col("view_ts_us"))
    AsOf.joinAsOf(purchases, views, "user_id", "ts", "ts",
        Seq("view_value", "view_ts_us"))
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts)").as("ts_us"),
        col("purchase_value"), col("view_value"), col("view_ts_us"))
      .orderBy("event_id")
  }

  /** q61: time-based rolling frames — RANGE BETWEEN a trailing 7-day
    * interval, per user. The semantics q09's ROW frames cannot express:
    * with irregular sampling, "last 7 rows" and "last 7 days" diverge;
    * RANGE frames follow the clock, including same-instant peers. The
    * frame bound is numeric micros over `unix_micros(ts)` so both
    * engines evaluate the identical window; sums are decimal-exact, the
    * window partitions by user (one exchange, never global).
    */
  def q61RangeFrames(s: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 24 * 3600 * 1000000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-sevenDaysUs, 0)
    events(s, dir)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_7d"),
        Num.roundD(Num.exactSum(col("value")).over(w).cast("double"))
          .as("sum_7d"),
        Num.roundD(Num.exactSum(col("value")).over(w).cast("double")
          / count(col("value")).over(w)).as("avg_7d"))
      .orderBy("event_id")
  }

  val q61Sql: String = {
    val f = "OVER (PARTITION BY user_id ORDER BY ts_us " +
      "RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)"
    s"""WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events)
       |SELECT event_id, user_id, ts_us,
       |  COUNT(*) $f AS n_7d,
       |  ${Num.sqlRoundD(s"CAST(SUM(CAST(value AS DECIMAL(25,6))) $f AS DOUBLE)")} AS sum_7d,
       |  ${Num.sqlRoundD(s"CAST(SUM(CAST(value AS DECIMAL(25,6))) $f AS DOUBLE) / COUNT(value) $f")} AS avg_7d
       |FROM e
       |ORDER BY event_id""".stripMargin
  }

  val q57Sql: String =
    s"""WITH p AS (
       |  SELECT event_id, user_id, ts, value AS purchase_value
       |  FROM events WHERE event_type = 'purchase'),
       |v AS (
       |  SELECT user_id, ts, ${Num.sqlRoundD("MAX(value)")} AS view_value,
       |    epoch_us(ts) AS view_ts_us
       |  FROM events WHERE event_type = 'view'
       |  GROUP BY user_id, ts)
       |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
       |  p.purchase_value, v.view_value, v.view_ts_us
       |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
       |ORDER BY p.event_id""".stripMargin

  // --------------------------------------------------------------- q133

  /** q133: cohort retention matrix — the canonical product-analytics
    * report: users cohorted by FIRST-activity week, each later week's
    * activity expressed as a fraction of the cohort (cohort_week ×
    * week_offset grid). The reference's engagement views answer "who is
    * active"; retention answers "of those who arrived together, who
    * stayed" — the question every weekly review opens with.
    *
    * Scale shape: the user-week activity grid is ONE distinct shuffle;
    * first-week and the offset join are user-co-partitioned (partial
    * aggregation + one sort-merge join on the same key — no broadcast
    * needed and no re-shuffle); cohort sizes are a week-sized frame
    * broadcast back. Weeks are Monday-truncated dates kept internal
    * (the house rule: DATE never reaches the output schema) and the
    * offset is exact integer division of a day difference between two
    * week-truncated dates.
    */
  def q133Retention(s: SparkSession, dir: String): DataFrame = {
    val uw = events(s, dir)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val first = uw.groupBy("user_id").agg(min("wk").as("cw"))
    val sizes = first.groupBy("cw")
      .agg(count_distinct(col("user_id")).as("cohort_size"))
    uw.join(first, "user_id")
      .withColumn("week_offset", expr("datediff(wk, cw) div 7").cast("int"))
      .groupBy("cw", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), "cw")
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        Num.roundD(col("n_active").cast("double") * lit(100.0) /
          col("cohort_size"), 4).as("retention_pct"))
      .orderBy("cohort_week", "week_offset")
  }

  val q133Sql: String =
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
       |  FROM events),
       |fw AS (SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id),
       |sz AS (SELECT cw, COUNT(DISTINCT user_id) AS cohort_size
       |  FROM fw GROUP BY cw),
       |j AS (
       |  SELECT uw.user_id, cw,
       |    CAST(DATE_DIFF('day', cw, wk) // 7 AS INT) AS week_offset
       |  FROM uw JOIN fw USING (user_id)),
       |r AS (
       |  SELECT cw, week_offset, COUNT(DISTINCT user_id) AS n_active
       |  FROM j GROUP BY 1, 2)
       |SELECT STRFTIME(r.cw, '%Y-%m-%d') AS cohort_week, week_offset,
       |  n_active, cohort_size,
       |  ${Num.sqlRoundD("CAST(n_active AS DOUBLE) * 100.0 / cohort_size", 4)}
       |    AS retention_pct
       |FROM r JOIN sz USING (cw)
       |ORDER BY cohort_week, week_offset""".stripMargin
}
