package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshaping operators: pivot (long → wide) and date-spine
  * densification (sparse → dense calendar), the two table-shape
  * transforms every reporting layer needs around the rollups.
  */
object Reshape {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private def withDay(d: DataFrame): DataFrame =
    d.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

  /** q58: pivot the per-(user, day) event stream into one column per
    * event type. The pivot value list is FIXED — `pivot(col, values)` —
    * so Spark skips the extra distinct-scan job it otherwise runs to
    * discover the values, and the plan is a single conditional
    * aggregate, identical in shape to q12's fused rollup. At 100 TB an
    * unlisted pivot is two full scans; a listed one is one.
    */
  def q58Pivot(s: SparkSession, dir: String): DataFrame =
    withDay(events(s, dir))
      .groupBy(col("user_id"), col("day"))
      .pivot("event_type", Seq("view", "click", "purchase", "error"))
      .agg(Num.sumD(col("value"), 2))
      .select(col("user_id"), col("day"),
        col("view").as("view_total"), col("click").as("click_total"),
        col("purchase").as("purchase_total"), col("error").as("error_total"))
      .orderBy("user_id", "day")

  val q58Sql: String = {
    def cell(t: String) =
      Num.sqlSum(s"CASE WHEN event_type = '$t' THEN value END", 2)
    s"""SELECT user_id, STRFTIME(ts, '%Y-%m-%d') AS day,
       |  ${cell("view")} AS view_total,
       |  ${cell("click")} AS click_total,
       |  ${cell("purchase")} AS purchase_total,
       |  ${cell("error")} AS error_total
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY user_id, day""".stripMargin
  }

  /** q59: date-spine densification — give every user a row for every
    * calendar day between their first and last activity, marking
    * observed vs gap days and forward-filling the engagement score
    * across gaps (the dbt date-spine pattern, distributed).
    *
    * Scale shape: the spine is `sequence(min_day, max_day)` exploded per
    * user — rows generated ∝ users × calendar span, never a cross join
    * against a calendar dim; the spine↔daily join shuffles on
    * (user_id, day); the fill is the q11 window. A user's span is
    * bounded by the calendar, so no key can blow up.
    */
  def q59DateSpine(s: SparkSession, dir: String): DataFrame = {
    val daily = withDay(events(s, dir))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        Num.avgD(when(col("event_type") === "view", col("value"))).as("view_score"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min("day").as("mn"), max("day").as("mx"))
      .select(col("user_id"), explode(
        expr("sequence(to_date(mn), to_date(mx), interval 1 day)")).as("d"))
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"))
    val fillW = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_observed", col("n_events").isNotNull.cast("int"))
      .withColumn("score_filled",
        last(col("view_score"), ignoreNulls = true).over(fillW))
      .select("user_id", "day", "is_observed", "n_events", "score_filled")
      .orderBy("user_id", "day")
  }

  val q59Sql: String =
    s"""WITH d AS (
       |  SELECT user_id, STRFTIME(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
       |    ${Num.sqlAvg("CASE WHEN event_type = 'view' THEN value END")} AS view_score
       |  FROM events GROUP BY 1, 2),
       |b AS (
       |  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM d GROUP BY 1),
       |sp AS (
       |  SELECT user_id, STRFTIME(gs, '%Y-%m-%d') AS day
       |  FROM b, UNNEST(generate_series(CAST(mn AS DATE), CAST(mx AS DATE),
       |    INTERVAL 1 DAY)) AS t(gs)),
       |j AS (
       |  SELECT sp.user_id, sp.day, d.n_events, d.view_score
       |  FROM sp LEFT JOIN d ON sp.user_id = d.user_id AND sp.day = d.day)
       |SELECT user_id, day,
       |  CAST(n_events IS NOT NULL AS INT) AS is_observed, n_events,
       |  LAST_VALUE(view_score IGNORE NULLS) OVER (PARTITION BY user_id
       |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS score_filled
       |FROM j
       |ORDER BY user_id, day""".stripMargin
}
