package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Component-composition analysis — the engine form of the reference's
  * sleep-architecture analyzer (reference: insights_engine/insights/
  * sleep_architecture.py:26-97 and dbt .../analytics/sleep_architecture
  * .sql: a view of per-component contributor scores beside the overall
  * score, then per-component overall mean, recent-7-day mean, the
  * recent-vs-baseline delta with a ±3 trend call, and the component's
  * correlation with the overall score).
  *
  * Mapping (§3): components = the focus event types' daily mean values
  * (view, click — the deep/REM pair), overall score = the day's mean over
  * ALL event types. The reference analyzer pulls one person's series into
  * pandas; here every step is per-(user, component) — one groupBy for the
  * long-form view, one window for recency, one partial-aggregated groupBy
  * for the summary. Nothing is global, so the plan is unchanged at 100 TB.
  */
object Architecture {

  /** The focus components — the analyzer's FOCUS_FACTORS pair. */
  val Components: Seq[String] = Seq("view", "click")

  /** Long-form architecture view: (user_id, day, component, comp_score,
    * overall_score) — the sleep_architecture.sql analog, registered as
    * `graft_architecture` by [[SemanticViews.registerAll]].
    */
  def componentDaily(events: DataFrame): DataFrame = {
    val day = date_format(col("ts"), "yyyy-MM-dd")
    val comp = events
      .filter(col("event_type").isin(Components: _*))
      .groupBy(col("user_id"), col("event_type").as("component"), day.as("day"))
      .agg(Num.avgD(col("value")).as("comp_score"))
    val overall = events
      .groupBy(col("user_id"), day.as("day"))
      .agg(Num.avgD(col("value")).as("overall_score"))
    comp.join(overall, Seq("user_id", "day"))
  }

  /** q73: per-(user, component) composition summary — n_days, overall
    * component mean, recent-7-day mean, their delta, the ±3 trend label
    * (sleep_architecture.py:162-178), and the component↔overall Pearson
    * correlation (py:63-69, min 7 days). Recency is a ROW_NUMBER over the
    * component's own days (the analyzer's tail(7) on the day-sorted
    * frame); the correlation is the closed-form Pearson over
    * decimal-exact sums — engine corr() streams in engine-specific order.
    */
  def q73ArchitectureDeltas(s: SparkSession, dir: String): DataFrame = {
    val arch = componentDaily(Tables.load(s, dir, "events"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "component").orderBy(col("day").desc)))
    val n = count(lit(1)).cast("double")
    val agg = arch.groupBy("user_id", "component")
      .agg(
        n.as("n_days"),
        Num.exactSum(col("comp_score")).cast("double").as("sx"),
        Num.exactSum(col("comp_score") * col("comp_score")).cast("double").as("sxx"),
        Num.exactSum(col("overall_score")).cast("double").as("sy"),
        Num.exactSum(col("overall_score") * col("overall_score")).cast("double").as("syy"),
        Num.exactSum(col("comp_score") * col("overall_score")).cast("double").as("sxy"),
        Num.exactSum(when(col("rn") <= 7, col("comp_score"))).cast("double").as("r7x"),
        count(when(col("rn") <= 7, 1)).cast("double").as("r7n"))
    val base = col("sx") / col("n_days")
    val recent = col("r7x") / col("r7n")
    val delta = Num.roundD(recent - base)
    val denom = (col("n_days") * col("sxx") - col("sx") * col("sx")) *
      (col("n_days") * col("syy") - col("sy") * col("sy"))
    agg
      .withColumn("comp_mean", Num.roundD(base))
      .withColumn("recent7_mean", Num.roundD(recent))
      .withColumn("delta", delta)
      .withColumn("trend",
        when(delta > 3, "up").when(delta < -3, "down").otherwise("stable"))
      .withColumn("corr_overall",
        when(col("n_days") >= 7 && denom > 0,
          Num.roundD((col("n_days") * col("sxy") - col("sx") * col("sy")) / sqrt(denom))))
      .select("user_id", "component", "n_days", "comp_mean", "recent7_mean",
        "delta", "trend", "corr_overall")
      .orderBy("user_id", "component")
  }

  val q73Sql: String = {
    val comps = Components.map(c => s"'$c'").mkString(", ")
    s"""WITH comp AS (
       |  SELECT user_id, event_type AS component, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${Num.sqlAvg("value")} AS comp_score
       |  FROM events WHERE event_type IN ($comps) GROUP BY 1, 2, 3),
       |overall AS (
       |  SELECT user_id, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${Num.sqlAvg("value")} AS overall_score
       |  FROM events GROUP BY 1, 2),
       |arch AS (
       |  SELECT c.user_id, c.day, c.component, c.comp_score, o.overall_score,
       |    ROW_NUMBER() OVER (PARTITION BY c.user_id, c.component ORDER BY c.day DESC) AS rn
       |  FROM comp c JOIN overall o ON c.user_id = o.user_id AND c.day = o.day),
       |agg AS (
       |  SELECT user_id, component,
       |    CAST(COUNT(*) AS DOUBLE) AS n_days,
       |    CAST(SUM(CAST(comp_score AS DECIMAL(25,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(comp_score * comp_score AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(overall_score AS DECIMAL(25,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(overall_score * overall_score AS DECIMAL(25,6))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(comp_score * overall_score AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST(CASE WHEN rn <= 7 THEN comp_score END AS DECIMAL(25,6))) AS DOUBLE) AS r7x,
       |    CAST(COUNT(CASE WHEN rn <= 7 THEN 1 END) AS DOUBLE) AS r7n
       |  FROM arch GROUP BY 1, 2)
       |SELECT user_id, component, n_days,
       |  ${Num.sqlRoundD("sx / n_days")} AS comp_mean,
       |  ${Num.sqlRoundD("r7x / r7n")} AS recent7_mean,
       |  ${Num.sqlRoundD("r7x / r7n - sx / n_days")} AS delta,
       |  CASE WHEN ${Num.sqlRoundD("r7x / r7n - sx / n_days")} > 3 THEN 'up'
       |       WHEN ${Num.sqlRoundD("r7x / r7n - sx / n_days")} < -3 THEN 'down'
       |       ELSE 'stable' END AS trend,
       |  CASE WHEN n_days >= 7
       |        AND (n_days * sxx - sx * sx) * (n_days * syy - sy * sy) > 0
       |    THEN ${Num.sqlRoundD(
              "(n_days * sxy - sx * sy) / SQRT((n_days * sxx - sx * sx) * (n_days * syy - sy * sy))")}
       |  END AS corr_overall
       |FROM agg
       |ORDER BY user_id, component""".stripMargin
  }
}
