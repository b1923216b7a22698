package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function suite: LAG/LEAD offsets, rolling frames, ROW_NUMBER
  * dedup, LAST_VALUE IGNORE NULLS forward-fill, and the flagship
  * multi-source daily rollup.
  *
  * Re-expresses the reference's gold/feature window SQL
  * (reference: dbt_bio_lakehouse/models/gold/workout_recovery_windows.sql:25-33,
  * models/features/feature_readiness_daily.sql:60-92,
  * models/gold/gold_daily_rollup.sql:10-80, glue/bio_etl_utils.py:163-187).
  *
  * Scale rule (SURVEY.md §4): every window is PARTITION BY an entity key
  * (user_id [, event_type]) — the reference's global ORDER BY date windows
  * would single-partition 100 TB; per-entity partitions shuffle once on the
  * entity key and parallelize across executors.
  */
object Windows {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Per-entity event ordering; event_id tiebreak keeps it total. */
  private val seq = Window.partitionBy("user_id", "event_type")
    .orderBy(col("ts"), col("event_id"))

  /** q08: LAG/LEAD offsets per (user_id, event_type) stream
    * (reference: workout_recovery_windows.sql:25-33 — prior/next workout
    * metrics around a recovery day).
    */
  def q08WindowLagLead(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        lag("value", 1).over(seq).as("prev_value"),
        lead("value", 1).over(seq).as("next_value"),
        Num.roundD(col("value") - lag("value", 1).over(seq)).as("delta_prev"))
      .orderBy("event_id")

  val q08Sql: String =
    s"""SELECT event_id, user_id, event_type, value,
       |  LAG(value, 1) OVER w AS prev_value,
       |  LEAD(value, 1) OVER w AS next_value,
       |  ${Num.sqlRoundD("value - LAG(value, 1) OVER w")} AS delta_prev
       |FROM events
       |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
       |ORDER BY event_id""".stripMargin

  /** q09: rolling frame ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
    * (reference: feature_readiness_daily.sql:60-92 — 7-sample rolling
    * baselines). Decimal-exact rolling sums: engines may evaluate frame
    * aggregates in different orders (e.g. segment trees), so double sums
    * are only comparable when addition is associative.
    */
  def q09WindowRolling(s: SparkSession, dir: String): DataFrame = {
    val frame = seq.rowsBetween(-6, Window.currentRow)
    events(s, dir)
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        Num.roundD(Num.exactSum(col("value")).over(frame).cast("double"))
          .as("rolling_sum"),
        Num.roundD(Num.exactSum(col("value")).over(frame).cast("double")
          / count(col("value")).over(frame)).as("rolling_avg"),
        min("value").over(frame).as("rolling_min"),
        max("value").over(frame).as("rolling_max"),
        count(lit(1)).over(frame).as("n_in_frame"))
      .orderBy("event_id")
  }

  val q09Sql: String = {
    val f = "OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id " +
      "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    s"""SELECT event_id, user_id, event_type, value,
       |  ${Num.sqlRoundD(s"CAST(SUM(CAST(value AS DECIMAL(25,6))) $f AS DOUBLE)")} AS rolling_sum,
       |  ${Num.sqlRoundD(s"CAST(SUM(CAST(value AS DECIMAL(25,6))) $f AS DOUBLE) / COUNT(value) $f")} AS rolling_avg,
       |  MIN(value) $f AS rolling_min,
       |  MAX(value) $f AS rolling_max,
       |  COUNT(*) $f AS n_in_frame
       |FROM events
       |ORDER BY event_id""".stripMargin
  }

  /** q10: ROW_NUMBER latest-per-key dedup
    * (reference: gold_daily_rollup.sql:43,68 — keep the latest record per
    * day when sources deliver duplicates). Key = (user_id, event_type, day);
    * winner = latest ts (event_id tiebreak).
    */
  def q10RownumDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("day"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("day"),
        col("event_id"), col("value"))
      .orderBy("user_id", "event_type", "day")
  }

  val q10Sql: String =
    """SELECT user_id, event_type, day, event_id, value
      |FROM (
      |  SELECT user_id, event_type, STRFTIME(ts, '%Y-%m-%d') AS day,
      |    event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, STRFTIME(ts, '%Y-%m-%d')
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type, day""".stripMargin

  /** q11: LAST_VALUE IGNORE NULLS forward-fill
    * (reference: gold_daily_rollup.sql:36-42, bio_etl_utils.py:163-187 —
    * carry the last observed metric forward over gaps). Gaps are simulated
    * deterministically (event_id % 7 < 3 → null) since the synthetic values
    * are dense.
    */
  def q11ForwardFill(s: SparkSession, dir: String): DataFrame = {
    val fillW = seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("sparse_value",
        when(col("event_id") % 7 < 3, lit(null)).otherwise(col("value")))
      .withColumn("filled_value",
        last("sparse_value", ignoreNulls = true).over(fillW))
      .select("event_id", "user_id", "event_type", "sparse_value", "filled_value")
      .orderBy("event_id")
  }

  val q11Sql: String =
    """SELECT event_id, user_id, event_type,
      |  CASE WHEN event_id % 7 < 3 THEN NULL ELSE value END AS sparse_value,
      |  LAST_VALUE(CASE WHEN event_id % 7 < 3 THEN NULL ELSE value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** q12: gold daily rollup — the flagship. Per-source daily metrics
    * (views / purchases / clicks / errors) rolled up per (user_id, day),
    * forward-filled engagement score, tiered activity CASE, and year/month
    * partition columns (reference: gold_daily_rollup.sql end-to-end +
    * oura_normalizer.py:295 partitioned write).
    *
    * The reference materializes four staged sources and FULL OUTER joins
    * them on the coalesced (user_id, day) key; the literal transplant
    * ([[dailyRollupJoined]]) scans the fact table four times and
    * re-shuffles after every join, because the coalesced USING key is a
    * fresh expression whose partitioning Catalyst cannot reuse. At 100 TB
    * that is 4 scans + 6 exchanges. Since all four "sources" project the
    * same fact table, the outer-join lattice collapses to ONE scan and ONE
    * shuffle: conditional aggregation per (user_id, day), with NULLIF/
    * null-sum semantics reproducing exactly the absent-source NULLs of the
    * outer join. The DuckDB oracle keeps the reference's FULL JOIN
    * formulation, so equivalence is verified every round (and
    * WindowsEquivalenceSpec asserts it in-engine).
    *
    * Scale: one partial-aggregated exchange on (user_id, day); the
    * forward-fill window re-partitions by user_id only. Output carries
    * year/month so a partitioned parquet write prunes at read time.
    */
  def q12DailyRollup(s: SparkSession, dir: String): DataFrame =
    dailyRollup(s, dir).orderBy("user_id", "day")

  /** q12's rollup WITHOUT the registered query's trailing global sort.
    * Every derived pipeline (the predictive layer, briefing, weekly
    * report, correlation panel, semantic views) consumes THIS: the
    * orderBy is q12's output contract, not part of the rollup, and
    * keeping it mid-pipeline costs each consumer a rangepartitioning
    * exchange + sort that the next window's hash re-partitioning
    * immediately discards (measured in q78's r5 plan audit: the range
    * exchange sat directly under the window's hash exchange).
    */
  def dailyRollup(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    def onlyFor(t: String): Column = when(col("event_type") === t, col("value"))
    val rolled = e.groupBy("user_id", "day")
      .agg(
        nullif(count(when(col("event_type") === "view", 1)), lit(0L)).as("views"),
        Num.avgD(onlyFor("view")).as("view_score"),
        nullif(count(when(col("event_type") === "purchase", 1)), lit(0L)).as("purchases"),
        Num.sumD(onlyFor("purchase"), 2).as("purchase_total"),
        nullif(count(when(col("event_type") === "click", 1)), lit(0L)).as("clicks"),
        nullif(count(when(col("event_type") === "error", 1)), lit(0L)).as("errors"))
      // the fused groupBy sees every (user_id, day) with ANY event; the
      // outer join only materializes days having at least one of the four
      // source types — drop all-null rows to match
      .filter(coalesce(col("views"), col("purchases"), col("clicks"), col("errors")).isNotNull)

    val fillW = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rolled
      .withColumn("view_score_filled",
        last("view_score", ignoreNulls = true).over(fillW))
      .withColumn("activity_state",
        when(coalesce(col("clicks"), lit(0L)) >= 5 && coalesce(col("purchases"), lit(0L)) >= 1, "power")
          .when(coalesce(col("purchases"), lit(0L)) >= 1, "buyer")
          .when(coalesce(col("clicks"), lit(0L)) + coalesce(col("views"), lit(0L)) >= 5, "active")
          .when(coalesce(col("errors"), lit(0L)) >= 3, "error_prone")
          .otherwise("passive"))
      .withColumn("year", substring(col("day"), 1, 4).cast("int"))
      .withColumn("month", substring(col("day"), 6, 2).cast("int"))
      .select("user_id", "day", "year", "month", "views", "view_score",
        "view_score_filled", "purchases", "purchase_total", "clicks",
        "errors", "activity_state")
  }

  /** The reference-literal outer-join formulation of q12's rollup core —
    * four staged aggregates FULL OUTER joined on the coalesced key. Kept
    * as the semantic spec for the fused plan (WindowsEquivalenceSpec
    * asserts both produce identical rows); not registered as a query
    * because its 4-scan / 6-exchange plan is the wrong shape at scale.
    */
  def dailyRollupJoined(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    def src(t: String, aggs: Seq[Column]): DataFrame =
      e.filter(col("event_type") === t).groupBy("user_id", "day").agg(aggs.head, aggs.tail: _*)
    src("view", Seq(count(lit(1)).as("views"), Num.avgD(col("value")).as("view_score")))
      .join(src("purchase", Seq(count(lit(1)).as("purchases"),
        Num.sumD(col("value"), 2).as("purchase_total"))), Seq("user_id", "day"), "full")
      .join(src("click", Seq(count(lit(1)).as("clicks"))), Seq("user_id", "day"), "full")
      .join(src("error", Seq(count(lit(1)).as("errors"))), Seq("user_id", "day"), "full")
  }

  val q12Sql: String =
    s"""WITH e AS (SELECT *, STRFTIME(ts, '%Y-%m-%d') AS day FROM events),
       |v AS (SELECT user_id, day, COUNT(*) AS views,
       |        ${Num.sqlAvg("value")} AS view_score
       |      FROM e WHERE event_type = 'view' GROUP BY 1, 2),
       |p AS (SELECT user_id, day, COUNT(*) AS purchases,
       |        ${Num.sqlSum("value", 2)} AS purchase_total
       |      FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
       |c AS (SELECT user_id, day, COUNT(*) AS clicks
       |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
       |er AS (SELECT user_id, day, COUNT(*) AS errors
       |      FROM e WHERE event_type = 'error' GROUP BY 1, 2),
       |j AS (SELECT * FROM v
       |      FULL JOIN p USING (user_id, day)
       |      FULL JOIN c USING (user_id, day)
       |      FULL JOIN er USING (user_id, day))
       |SELECT user_id, day,
       |  CAST(SUBSTRING(day, 1, 4) AS INT) AS year,
       |  CAST(SUBSTRING(day, 6, 2) AS INT) AS month,
       |  views, view_score,
       |  LAST_VALUE(view_score IGNORE NULLS) OVER
       |    (PARTITION BY user_id ORDER BY day
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_score_filled,
       |  purchases, purchase_total, clicks, errors,
       |  CASE
       |    WHEN COALESCE(clicks, 0) >= 5 AND COALESCE(purchases, 0) >= 1 THEN 'power'
       |    WHEN COALESCE(purchases, 0) >= 1 THEN 'buyer'
       |    WHEN COALESCE(clicks, 0) + COALESCE(views, 0) >= 5 THEN 'active'
       |    WHEN COALESCE(errors, 0) >= 3 THEN 'error_prone'
       |    ELSE 'passive' END AS activity_state
       |FROM j
       |ORDER BY user_id, day""".stripMargin
}
