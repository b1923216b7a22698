package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative alert-rule evaluation — the engine form of the reference's
  * daily health-alert Lambda (reference: lambda/health_alerts/handler.py:
  * 78-204, which runs four hand-coded Athena queries and compares rows in
  * Python). Here the rules are DATA: a literal rules frame (condition,
  * metric, direction, k_sigma, severity) broadcast-joined against a
  * per-entity latest-day + trailing-30-day-baseline frame, so adding a
  * rule is adding a row, not code. The reference's two non-threshold
  * conditions keep their own declarative branches: a 3-consecutive-day
  * decline (LAG window, handler.py:188-202) and a high-overtraining-risk
  * state (acute-vs-chronic load ratio, handler.py:174-186 over the
  * overtraining_risk view).
  *
  * Scale shape: one scan of events → per-(user, metric, day) partial
  * aggregation; baselines are per-entity trailing windows (never global);
  * the rules side is rows-of-config (broadcast by construction). At
  * 100 TB this is a groupBy + window + broadcast-join plan with no
  * driver-side evaluation — the Lambda's Python loop is exactly what
  * cannot scale past one entity.
  */
object Alerts {

  private val dayCol: Column = date_format(col("ts"), "yyyy-MM-dd")

  /** Threshold-rule table. direction `above` fires when the latest daily
    * value exceeds baseline_mean + k·σ; `below` when it falls under
    * baseline_mean − k·σ (reference: handler.py:140-172, the RHR/HRV
    * 1.5-sigma rules; severities follow the handler's).
    */
  private val ruleRows: Seq[(String, String, String, Double, String)] = Seq(
    ("Elevated Purchase Spend", "purchase", "above", 1.5, "warning"),
    ("Depressed View Score", "view", "below", 1.5, "warning"),
    ("Elevated Error Level", "error", "above", 2.0, "critical"),
    ("Depressed Click Activity", "click", "below", 2.0, "info"))

  /** The rules as a frame — literal config data, broadcast at use. */
  def rules(s: SparkSession): DataFrame = {
    import s.implicits._
    ruleRows.toDF("condition", "metric", "direction", "k_sigma", "severity")
  }

  /** Per-(user, metric, day) observed value: the daily mean of the metric
    * (metric = event_type — the §3 mapping of the reference's per-day bio
    * metrics), plus the daily SUM the load-based rules consume (q71's
    * overtraining branch — carried here so all three alert branches ride
    * ONE fact scan and one shuffle). One partial-aggregated shuffle.
    */
  def dailyMetrics(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), col("event_type").as("metric"), dayCol.as("day"))
      .agg(Num.avgD(col("value")).as("observed"),
        Num.sumD(col("value"), 2).as("observed_sum"))

  /** Static per-(user, metric) baseline over the FULL history — mean and
    * std from decimal-exact sums (the q14 discipline: engine-native stddev
    * streams in engine-specific order). Used by the streaming twin, where
    * the baseline is yesterday's batch state and the stream supplies only
    * the newest days.
    */
  def thresholdBaseline(daily: DataFrame): DataFrame = {
    val guarded = daily.groupBy("user_id", "metric")
      .agg(
        count(col("observed")).cast("double").as("n"),
        Num.exactSum(col("observed")).cast("double").as("sx"),
        Num.exactSum(col("observed") * col("observed")).cast("double").as("sxx"))
      .filter(col("n") >= 5)
      .withColumn("variance", (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0))
      .filter(col("variance") > 0)
    guarded.select(col("user_id"), col("metric"),
      (col("sx") / col("n")).as("mu"), sqrt(col("variance")).as("sigma"))
  }

  /** q71: evaluate every alert rule for every entity's latest day.
    *
    * Branch 1 (threshold rules): the latest (user, metric) day joined to
    * its trailing-30-day baseline (rows -30..-1 — the latest observation
    * never contaminates its own baseline) and broadcast-joined to the
    * rules frame; fires when the observed daily value crosses
    * mean ± k·σ. Branch 2 (streak): the view score declining three
    * consecutive days (value < prev1 < prev2). Branch 3 (state): acute
    * 7-day purchase load exceeding 1.2× the chronic 42-day load — the
    * overtraining_risk = 'high_risk' classification of the reference's
    * semantic view, evaluated on the latest day with ≥ 14 days history.
    *
    * Output: one row per fired alert — (user_id, condition, severity,
    * metric, day, observed, threshold), where `threshold` is the bound
    * that was crossed (the baseline bound, the previous day's value, or
    * 1.2× chronic load).
    */
  def q71AlertRules(s: SparkSession, dir: String): DataFrame = {
    // persisted: the annotated-window chain AND the load branch both
    // consume it — one fact scan + one shuffle total, cached at daily
    // grain (tiny next to the fact table)
    val daily = dailyMetrics(Tables.load(s, dir, "events")).persist()

    val wSeq = Window.partitionBy("user_id", "metric").orderBy("day")
    val wBase = wSeq.rowsBetween(-30, -1)
    val wDesc = Window.partitionBy("user_id", "metric").orderBy(col("day").desc)
    val n = count(col("observed")).over(wBase).cast("double")
    val sx = Num.exactSum(col("observed")).over(wBase).cast("double")
    val sxx = Num.exactSum(col("observed") * col("observed")).over(wBase).cast("double")
    val annotated = daily
      .withColumn("n", n)
      .withColumn("mu", sx / n)
      .withColumn("variance", when(n > 1, (sxx - sx * sx / n) / (n - lit(1.0))))
      .withColumn("prev1", lag("observed", 1).over(wSeq))
      .withColumn("prev2", lag("observed", 2).over(wSeq))
      .withColumn("rn", row_number().over(wDesc))
    // NOT persisted: `latest` feeds both the threshold and streak
    // branches, but persisting it measured flat (1.81 s vs 1.78 s at
    // sf0.1) — the two branch re-derivations overlap on the shared
    // shuffle output, and the cost here is the scan + five windows, the
    // same shape and magnitude as q14's z-score pass
    val latest = annotated.filter(col("rn") === 1)

    val thresholdAlerts = latest
      .filter(col("n") >= 5 && col("variance") > 0)
      .join(broadcast(rules(s)), Seq("metric"))
      .withColumn("threshold", Num.roundD(
        when(col("direction") === "above",
          col("mu") + col("k_sigma") * sqrt(col("variance")))
          .otherwise(col("mu") - col("k_sigma") * sqrt(col("variance")))))
      .filter(
        (col("direction") === "above" && col("observed") > col("threshold")) ||
        (col("direction") === "below" && col("observed") < col("threshold")))
      .select(col("user_id"), col("condition"), col("severity"), col("metric"),
        col("day"), col("observed"), col("threshold"))

    val streakAlerts = latest
      .filter(col("metric") === "view" &&
        col("prev1").isNotNull && col("prev2").isNotNull &&
        col("observed") < col("prev1") && col("prev1") < col("prev2"))
      .select(col("user_id"),
        lit("Readiness Declining").as("condition"), lit("info").as("severity"),
        col("metric"), col("day"), col("observed"), col("prev1").as("threshold"))

    // The load branch rides the SAME daily aggregate as the threshold and
    // streak branches (dailyMetrics carries the daily sum) — no second
    // fact scan; its window repartitions only the purchase slice of the
    // small daily frame.
    val load = daily.filter(col("metric") === "purchase")
      .select(col("user_id"), col("day"), col("observed_sum").as("daily_load"))
    val lSeq = Window.partitionBy("user_id").orderBy("day")
    def rollAvg(f: org.apache.spark.sql.expressions.WindowSpec): Column =
      Num.roundD(Num.exactSum(col("daily_load")).over(f).cast("double")
        / count(lit(1)).over(f))
    val riskAlerts = load
      .withColumn("ctl", rollAvg(lSeq.rowsBetween(-41, Window.currentRow)))
      .withColumn("atl", rollAvg(lSeq.rowsBetween(-6, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("day").desc)))
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("n_days") >= 14)
      .withColumn("threshold", Num.roundD(col("ctl") * 1.2))
      .filter(col("atl") > col("threshold"))
      .select(col("user_id"),
        lit("High Overtraining Risk").as("condition"), lit("critical").as("severity"),
        lit("purchase_load").as("metric"), col("day"),
        col("atl").as("observed"), col("threshold"))

    thresholdAlerts.unionByName(streakAlerts).unionByName(riskAlerts)
      .orderBy("user_id", "condition", "metric")
  }

  val q71Sql: String = {
    val values = ruleRows.map { case (c, m, d, k, sev) =>
      s"('$c', '$m', '$d', $k, '$sev')"
    }.mkString(",\n    ")
    val wb = "OVER (PARTITION BY user_id, metric ORDER BY day ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)"
    val ctlF = "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 41 PRECEDING AND CURRENT ROW)"
    val atlF = "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    def rollAvg(f: String) =
      Num.sqlRoundD(s"CAST(SUM(CAST(daily_load AS DECIMAL(25,6))) $f AS DOUBLE) / COUNT(*) $f")
    s"""WITH daily AS (
       |  SELECT user_id, event_type AS metric, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${Num.sqlAvg("value")} AS observed
       |  FROM events GROUP BY 1, 2, 3),
       |ann AS (
       |  SELECT user_id, metric, day, observed,
       |    CAST(COUNT(observed) $wb AS DOUBLE) AS n,
       |    CAST(SUM(CAST(observed AS DECIMAL(25,6))) $wb AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(observed * observed AS DECIMAL(25,6))) $wb AS DOUBLE) AS sxx,
       |    LAG(observed, 1) OVER wa AS prev1,
       |    LAG(observed, 2) OVER wa AS prev2,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, metric ORDER BY day DESC) AS rn
       |  FROM daily
       |  WINDOW wa AS (PARTITION BY user_id, metric ORDER BY day)),
       |latest AS (SELECT * FROM ann WHERE rn = 1),
       |rules(condition, metric, direction, k_sigma, severity) AS (VALUES
       |    $values),
       |thr0 AS (
       |  SELECT l.user_id, r.condition, r.severity, l.metric, l.day, l.observed,
       |    r.direction,
       |    ${Num.sqlRoundD(
             "CASE WHEN r.direction = 'above' " +
             "THEN l.sx / l.n + CAST(r.k_sigma AS DOUBLE) * SQRT((l.sxx - l.sx * l.sx / l.n) / (l.n - 1.0)) " +
             "ELSE l.sx / l.n - CAST(r.k_sigma AS DOUBLE) * SQRT((l.sxx - l.sx * l.sx / l.n) / (l.n - 1.0)) END")} AS threshold
       |  FROM latest l JOIN rules r ON l.metric = r.metric
       |  WHERE l.n >= 5 AND (l.sxx - l.sx * l.sx / l.n) / (l.n - 1.0) > 0),
       |thr AS (
       |  SELECT user_id, condition, severity, metric, day, observed, threshold
       |  FROM thr0
       |  WHERE (direction = 'above' AND observed > threshold)
       |     OR (direction = 'below' AND observed < threshold)),
       |streak AS (
       |  SELECT user_id, 'Readiness Declining' AS condition, 'info' AS severity,
       |    metric, day, observed, prev1 AS threshold
       |  FROM latest
       |  WHERE metric = 'view' AND prev1 IS NOT NULL AND prev2 IS NOT NULL
       |    AND observed < prev1 AND prev1 < prev2),
       |dload AS (
       |  SELECT user_id, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${Num.sqlSum("value", 2)} AS daily_load
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |rolled AS (
       |  SELECT user_id, day,
       |    ${rollAvg(ctlF)} AS ctl,
       |    ${rollAvg(atlF)} AS atl,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn,
       |    COUNT(*) OVER (PARTITION BY user_id) AS n_days
       |  FROM dload),
       |risk AS (
       |  SELECT user_id, 'High Overtraining Risk' AS condition, 'critical' AS severity,
       |    'purchase_load' AS metric, day, atl AS observed,
       |    ${Num.sqlRoundD("ctl * 1.2")} AS threshold
       |  FROM rolled
       |  WHERE rn = 1 AND n_days >= 14 AND atl > ${Num.sqlRoundD("ctl * 1.2")})
       |SELECT * FROM thr
       |UNION ALL SELECT * FROM streak
       |UNION ALL SELECT * FROM risk
       |ORDER BY user_id, condition, metric""".stripMargin
  }
}
