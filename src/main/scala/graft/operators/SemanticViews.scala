package graft.operators

import graft.Num
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The semantic-view layer: the reference exposes its gold rollup to users
  * through 7 Athena views (reference: athena/views.sql:18,50,86,143,192,
  * 228,248); a user "switches" by querying these by name. This module
  * registers the analogs as temp views over the q12 daily rollup, one per
  * reference view, via [[registerAll]].
  *
  * Scale note (SURVEY.md §4): the reference's views window with a global
  * `ORDER BY date` — valid for one person's series, a single-partition
  * collapse at fleet scale. Every window here partitions by user_id.
  */
object SemanticViews {

  private def perUser = Window.partitionBy("user_id").orderBy("day")
  private def frame(n: Int) = perUser.rowsBetween(-(n - 1), Window.currentRow)

  private def rollAvg(c: String, n: Int) =
    Num.roundD(Num.exactSum(col(c)).over(frame(n)).cast("double")
      / count(col(c)).over(frame(n)))

  /** dashboard_30day analog: daily metrics + 7/30-day rolling averages
    * (views.sql:18-43).
    */
  def dashboard30d(rollup: DataFrame): DataFrame =
    rollup.select(
      col("user_id"), col("day"), col("views"), col("view_score"),
      col("purchases"), col("purchase_total"), col("clicks"), col("errors"),
      col("activity_state"),
      rollAvg("view_score", 7).as("view_score_7day_avg"),
      rollAvg("purchase_total", 7).as("purchase_7day_avg"),
      rollAvg("view_score", 30).as("view_score_30day_avg"),
      rollAvg("purchase_total", 30).as("purchase_30day_avg"))

  /** workout_recommendations analog: 3-day trailing average + tiered
    * next-action recommendation + previous-day context (views.sql:50-80).
    */
  def recommendations(rollup: DataFrame): DataFrame = {
    val vs = coalesce(col("view_score_filled"), lit(0.0))
    val clk = coalesce(col("clicks"), lit(0L))
    rollup.select(
      col("user_id"), col("day"), col("view_score_filled"), col("clicks"),
      rollAvg("view_score_filled", 3).as("score_3day_avg"),
      when(vs >= 15 && clk >= 3, "high_touch")
        .when(vs >= 8 && clk >= 1, "moderate_touch")
        .when(vs >= 3, "light_touch")
        .otherwise("re_engage").as("recommended_action"),
      lag("purchase_total", 1).over(perUser).as("prev_day_purchase_total"),
      lag("clicks", 1).over(perUser).as("prev_day_clicks"))
  }

  /** energy_state analog: multi-factor daily state classification
    * (views.sql:86-141).
    */
  def energyState(rollup: DataFrame): DataFrame = {
    val vs = coalesce(col("view_score_filled"), lit(0.0))
    val p = coalesce(col("purchases"), lit(0L))
    val er = coalesce(col("errors"), lit(0L))
    rollup.select(
      col("user_id"), col("day"), col("view_score_filled"),
      col("purchases"), col("errors"),
      when(vs >= 15 && p >= 1 && er === 0, "peak")
        .when(vs >= 10, "charged")
        .when(vs >= 5 || p >= 1, "steady")
        .when(er >= 3, "strained")
        .otherwise("depleted").as("energy_state"))
  }

  /** overtraining_risk analog: 3-day decline detection + streak count +
    * ratio guard, with guidance text (views.sql:143-190).
    */
  def churnRisk(rollup: DataFrame): DataFrame = {
    val vs = col("view_score_filled")
    val declining = vs < 8 &&
      vs < lag("view_score_filled", 1).over(perUser) &&
      vs < lag("view_score_filled", 2).over(perUser)
    val errStreak = sum(when(coalesce(col("errors"), lit(0L)) > 0, 1).otherwise(0))
      .over(frame(3))
    val errRatio = coalesce(col("errors"), lit(0L)).cast("double") /
      greatest(coalesce(col("clicks"), lit(0L)), lit(1L)).cast("double")
    rollup.select(
      col("user_id"), col("day"), col("view_score_filled"), col("errors"),
      (vs - rollAvg("view_score_filled", 4)).as("score_vs_recent"),
      errStreak.as("error_days_last_3"),
      when(declining, "high_risk")
        .when(vs < 10 && errStreak >= 3, "moderate_risk")
        .when(errRatio > 2.0, "moderate_risk")
        .otherwise("low_risk").as("churn_risk"),
      when(declining, "Score declining 3+ days and low. Intervene now.")
        .when(vs < 10 && errStreak >= 3, "Low score with 3 error days. Investigate friction.")
        .when(errRatio > 2.0, "Error-to-click ratio very high despite engagement.")
        .otherwise("Engagement looks healthy.").as("risk_guidance"))
      .filter(col("view_score_filled").isNotNull)
  }

  /** training_load_daily analog: the tiered effort-score CASE applied at
    * daily grain (views.sql:192-226, macros/tss_calculation.sql:11-32).
    */
  def loadDaily(rollup: DataFrame): DataFrame = {
    val pt = col("purchase_total"); val clk = col("clicks").cast("double")
    rollup.select(
      col("user_id"), col("day"), col("purchases"), col("purchase_total"), col("clicks"),
      Num.roundD(
        when(coalesce(col("purchases"), lit(0L)) === 0, lit(0.0))
          .when(pt.isNotNull && pt > 0, least(lit(300.0), pt * coalesce(clk, lit(140.0)) / 600.0))
          .when(clk.isNotNull && clk > 0, least(lit(200.0), clk * 12.0))
          .otherwise(lit(0.0))).as("daily_load_score"))
  }

  /** temperature_trends analog: deviation vs trailing baseline + threshold
    * status (views.sql:228-246).
    */
  def deviationTrends(rollup: DataFrame): DataFrame = {
    val dev = col("view_score_filled") - rollAvg("view_score_filled", 7)
    rollup.select(
      col("user_id"), col("day"), col("view_score_filled"),
      Num.roundD(dev).as("score_deviation"),
      Num.roundD(dev - lag(dev, 1).over(perUser)).as("deviation_trend"),
      when(abs(dev) > 5.0, "elevated")
        .when(abs(dev) > 3.0, "mild")
        .otherwise("normal").as("deviation_status"))
      .filter(col("view_score_filled").isNotNull)
  }

  /** sleep_architecture analog: composition ratios of the daily activity
    * mix (views.sql:248+).
    */
  def activityMix(rollup: DataFrame): DataFrame = {
    val total = coalesce(col("views"), lit(0L)) + coalesce(col("purchases"), lit(0L)) +
      coalesce(col("clicks"), lit(0L)) + coalesce(col("errors"), lit(0L))
    def share(c: String) =
      Num.roundD(coalesce(col(c), lit(0L)).cast("double") / greatest(total, lit(1L)))
    rollup.select(
      col("user_id"), col("day"), total.as("total_events"),
      share("views").as("view_share"),
      share("purchases").as("purchase_share"),
      share("clicks").as("click_share"),
      share("errors").as("error_share"),
      when(share("errors") > 0.3, "error_heavy")
        .when(share("purchases") > 0.3, "conversion_heavy")
        .when(share("views") > 0.6, "browse_heavy")
        .otherwise("balanced").as("mix_profile"))
  }

  /** Register the whole semantic layer as queryable temp views (the
    * reference's `bio_gold.*` surface), computing the rollup from the raw
    * events under `dir`. When the gold rollup is already materialized
    * (e.g. by [[graft.Pipeline]]), pass its DataFrame to [[registerOver]]
    * instead so view queries read the pruned parquet rather than
    * re-running the rollup. Returns the view names.
    */
  def registerAll(s: SparkSession, dir: String): Seq[String] = {
    // the architecture view derives from events, not the rollup — the
    // reference's sleep_architecture.sql likewise joins a staging table
    // to gold rather than reading gold alone
    Architecture.componentDaily(graft.Tables.load(s, dir, "events"))
      .createOrReplaceTempView("graft_architecture")
    registerOver(Windows.dailyRollup(s, dir)) :+ "graft_architecture"
  }

  /** Register the semantic layer over an existing rollup frame. */
  def registerOver(rollup: DataFrame): Seq[String] = {
    rollup.createOrReplaceTempView("graft_daily_rollup")
    val views = Seq(
      "graft_dashboard_30d" -> dashboard30d(rollup),
      "graft_recommendations" -> recommendations(rollup),
      "graft_energy_state" -> energyState(rollup),
      "graft_churn_risk" -> churnRisk(rollup),
      "graft_load_daily" -> loadDaily(rollup),
      "graft_deviation_trends" -> deviationTrends(rollup),
      "graft_activity_mix" -> activityMix(rollup),
      // predictive layer (reference: sleep_performance_prediction.sql,
      // workout_type_optimization.sql — the two analytics views the
      // what-if simulator reads)
      "graft_next_day_prediction" -> Predictive.nextDayPairs(rollup),
      "graft_cohort_optimization" -> Predictive.cohortTable(rollup))
    views.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    "graft_daily_rollup" +: views.map(_._1)
  }
}
