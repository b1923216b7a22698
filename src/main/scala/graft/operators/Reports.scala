package graft.operators

import graft.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Weekly-report composition — the data layer of the reference's weekly
  * report generator (reference: insights_engine/reports/weekly_report.py:
  * 121-347), which fires FOUR sequential Athena reads per report: this
  * week's key metrics (:226-312), the previous week's for comparison
  * (:152-155), the day-by-day breakdown (:314-347), and a staleness probe
  * (:206-224). The narrative/HTML/chart layers above it are declared
  * non-goals (SURVEY §6); everything the narrative CONSUMES is here.
  *
  * Engine form: the four reads fuse into one conditional-aggregation pass
  * over the q12 rollup — this-week vs previous-week metrics are CASE-gated
  * aggregates over the same scan, anchored at the corpus max day (the
  * deterministic stand-in for `date.today()`), the WoW deltas the
  * reference formats into its prompt (:374-377) become columns, and the
  * staleness probe's 3-day rule (:220-221) is a per-entity flag off the
  * same pass. Per-entity instead of the generator's single-user loop.
  *
  * Scale shape: one rollup exchange on (user_id, day), a 1-row broadcast
  * for the anchor day, one bounded groupBy(user_id). The fused pass reads
  * 14 days of rollup ONCE where the reference reads overlapping slices
  * four times.
  */
object Reports {

  /** trend_class (weekly_report.py:261-269): banded good/bad thresholds. */
  private def trendClass(v: Column, good: Double, bad: Double): Column =
    when(v.isNull, "")
      .when(v >= good, "trend-up")
      .when(v <= bad, "trend-down")
      .otherwise("trend-stable")

  private def sqlTrendClass(e: String, good: Double, bad: Double): String =
    s"""CASE WHEN $e IS NULL THEN ''
       |     WHEN $e >= $good THEN 'trend-up'
       |     WHEN $e <= $bad THEN 'trend-down'
       |     ELSE 'trend-stable' END""".stripMargin

  /** q79: one weekly-report row per entity — this week's key metrics
    * (avg readiness = view score, workout days, total output, data days,
    * avg clicks / errors — the reference's metric card list at :271-307
    * mapped through SURVEY §3), the previous week's comparators, the WoW
    * deltas, the trend classes, and the staleness flag (latest entity day
    * more than 3 days behind the corpus max, :220-221).
    */
  def q79WeeklyReport(s: SparkSession, dir: String): DataFrame = {
    val rollup = Windows.dailyRollup(s, dir)
    val maxDay = rollup.agg(max("day").as("max_day"))

    val bounded = rollup.crossJoin(broadcast(maxDay))
      .withColumn("week_start",
        date_format(date_sub(to_date(col("max_day")), 6), "yyyy-MM-dd"))
      .withColumn("prev_start",
        date_format(date_sub(to_date(col("max_day")), 13), "yyyy-MM-dd"))
      .filter(col("day") >= col("prev_start"))
    val inThis = col("day") >= col("week_start")
    val inPrev = !inThis

    def cAvg(gate: Column, c: Column): Column = {
      val v = when(gate, c)
      Num.roundD(Num.exactSum(v).cast("double") / count(v), 1)
    }
    def cSum(gate: Column, c: Column): Column = {
      val v = when(gate, c)
      when(count(v) > 0, Num.roundD(Num.exactSum(v).cast("double"), 0))
    }
    def cDays(gate: Column): Column = count(when(gate, 1))

    val g = bounded.groupBy("user_id", "max_day", "week_start", "prev_start").agg(
      cDays(inThis).as("data_days"),
      cAvg(inThis, col("view_score")).as("avg_readiness"),
      count(when(inThis && coalesce(col("purchases"), lit(0L)) >= 1, 1)).as("workout_days"),
      cSum(inThis, col("purchase_total")).as("total_output"),
      cAvg(inThis, col("clicks").cast("double")).as("avg_clicks"),
      cAvg(inThis, col("errors").cast("double")).as("avg_errors"),
      cDays(inPrev).as("prev_data_days"),
      cAvg(inPrev, col("view_score")).as("prev_avg_readiness"),
      count(when(inPrev && coalesce(col("purchases"), lit(0L)) >= 1, 1)).as("prev_workout_days"),
      cSum(inPrev, col("purchase_total")).as("prev_total_output"),
      max("day").as("latest_day"))

    g.select(
        col("user_id"),
        col("week_start"), col("max_day").as("week_end"),
        col("data_days"), col("avg_readiness"),
        trendClass(col("avg_readiness"), 82, 70).as("readiness_trend"),
        col("workout_days"), col("total_output"),
        col("avg_clicks"), col("avg_errors"),
        col("prev_data_days"), col("prev_avg_readiness"),
        Num.roundD(col("avg_readiness") - col("prev_avg_readiness"), 1).as("readiness_delta"),
        (col("workout_days") - col("prev_workout_days")).as("workout_days_delta"),
        Num.roundD(col("total_output") - col("prev_total_output"), 0).as("output_delta"),
        (datediff(to_date(col("max_day")), to_date(col("latest_day"))) > 3)
          .cast("int").as("is_stale"))
      .orderBy("user_id")
  }

  val q79Sql: String = {
    val rollupCte = s"rollup12 AS (\n${Windows.q12Sql}\n)"
    def cAvg(gate: String, e: String) = Num.sqlRoundD(
      s"CAST(SUM(CASE WHEN $gate THEN CAST(($e) AS DECIMAL(25,6)) END) AS DOUBLE)" +
        s" / COUNT(CASE WHEN $gate THEN ($e) END)", 1)
    def cSum(gate: String, e: String) =
      s"CASE WHEN COUNT(CASE WHEN $gate THEN ($e) END) > 0 THEN " +
        Num.sqlRoundD(s"CAST(SUM(CASE WHEN $gate THEN CAST(($e) AS DECIMAL(25,6)) END) AS DOUBLE)", 0) +
        " END"
    val tw = "day >= week_start"
    val pw = "day < week_start"
    s"""WITH $rollupCte,
       |mx AS (SELECT MAX(day) AS max_day FROM rollup12),
       |bounded AS (
       |  SELECT r.*, max_day,
       |    STRFTIME(CAST(max_day AS DATE) - 6, '%Y-%m-%d') AS week_start,
       |    STRFTIME(CAST(max_day AS DATE) - 13, '%Y-%m-%d') AS prev_start
       |  FROM rollup12 r CROSS JOIN mx
       |  WHERE day >= STRFTIME(CAST(max_day AS DATE) - 13, '%Y-%m-%d')),
       |g AS (
       |  SELECT user_id, max_day, week_start, prev_start,
       |    COUNT(CASE WHEN $tw THEN 1 END) AS data_days,
       |    ${cAvg(tw, "view_score")} AS avg_readiness,
       |    COUNT(CASE WHEN $tw AND COALESCE(purchases, 0) >= 1 THEN 1 END) AS workout_days,
       |    ${cSum(tw, "purchase_total")} AS total_output,
       |    ${cAvg(tw, "CAST(clicks AS DOUBLE)")} AS avg_clicks,
       |    ${cAvg(tw, "CAST(errors AS DOUBLE)")} AS avg_errors,
       |    COUNT(CASE WHEN $pw THEN 1 END) AS prev_data_days,
       |    ${cAvg(pw, "view_score")} AS prev_avg_readiness,
       |    COUNT(CASE WHEN $pw AND COALESCE(purchases, 0) >= 1 THEN 1 END) AS prev_workout_days,
       |    ${cSum(pw, "purchase_total")} AS prev_total_output,
       |    MAX(day) AS latest_day
       |  FROM bounded GROUP BY 1, 2, 3, 4)
       |SELECT user_id, week_start, max_day AS week_end,
       |  data_days, avg_readiness,
       |  ${sqlTrendClass("avg_readiness", 82, 70)} AS readiness_trend,
       |  workout_days, total_output, avg_clicks, avg_errors,
       |  prev_data_days, prev_avg_readiness,
       |  ${Num.sqlRoundD("avg_readiness - prev_avg_readiness", 1)} AS readiness_delta,
       |  workout_days - prev_workout_days AS workout_days_delta,
       |  ${Num.sqlRoundD("total_output - prev_total_output", 0)} AS output_delta,
       |  CAST(date_diff('day', CAST(latest_day AS DATE), CAST(max_day AS DATE)) > 3 AS INT) AS is_stale
       |FROM g
       |ORDER BY user_id""".stripMargin
  }
}
