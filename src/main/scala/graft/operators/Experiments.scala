package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's self-experiment analysis module, re-expressed as
  * declarative Spark plans (reference: insights_engine/experiments/
  * analyzer.py — Normal-Normal conjugate Bayesian pre/post analysis at
  * lines 105-171, difference-in-differences with parallel-trends
  * validation at 174-226, and Pearson correlation analysis with a rolling
  * window at 309-390; the sleep→readiness correlation insight at
  * insights_engine/insights/sleep_readiness.py:26-105 is the same panel
  * with a fixed input/outcome pair).
  *
  * The reference fetches one entity's series into pandas/scipy and loops.
  * Here interventions are DATA — a literal frame broadcast against the
  * per-(entity, metric, day) aggregation — and every statistic is a
  * closed-form expression over decimal-exact conditional sums, so the
  * whole experiment battery for EVERY entity is one scan, one partial
  * aggregated shuffle, and one bounded groupBy. Nothing driver-side, no
  * UDFs; the probability integrals use [[Num.phi]], a portable erf-based
  * normal CDF that the DuckDB oracle replays bit-for-bit.
  *
  * Scale shape at 100 TB: the events scan dominates; the per-(user,
  * metric, day) aggregation is partial (map-side combine), the
  * interventions side is rows-of-config (broadcast by construction), and
  * the per-(intervention, user) result frame is |users|×|interventions| —
  * small by nature. The reference's per-entity Python loop is exactly the
  * part that cannot scale; these plans have no such loop.
  */
object Experiments {

  /** Pre-intervention window length, analyzer.py:74 `pre_days` default. */
  private val preDays = 14

  /** Intervention registry — the analyzer's `Intervention` records
    * (tracker.py:31-47) as literal config rows:
    * (id, name, itype, metric, start_day, end_day, washout_days).
    * `end_day = None` models a still-active intervention: its post
    * period runs through the corpus max day (the deterministic stand-in
    * for the reference's `date.today()`, analyzer.py:83-86).
    */
  private val interventionRows: Seq[(String, String, String, String, String, Option[String], Int)] = Seq(
    ("i1", "Creatine Loading", "supplement", "purchase", "2024-01-15", Some("2024-01-25"), 3),
    ("i2", "Evening Wind-Down", "sleep_protocol", "view", "2024-01-12", None, 3),
    ("i3", "Carb Cycling", "diet", "click", "2024-01-18", Some("2024-01-27"), 2))

  /** The interventions as a frame — config data, broadcast at use. */
  def interventions(s: SparkSession): DataFrame = {
    import s.implicits._
    interventionRows.toDF("id", "name", "itype", "metric", "start_day", "end_day", "washout")
  }

  /** Per-(intervention, user, day) observations tagged 'pre' / 'post'.
    *
    * The daily series is [[Alerts.dailyMetrics]] (one partial-aggregated
    * shuffle); the interventions frame gains its window bounds from a
    * 1-row corpus-max-day broadcast (analyzer.py:77-102 get_pre_post_data:
    * pre = [start-14, start-1], post = [start, end+washout] or
    * [start, today]); the range join against 3 config rows broadcasts.
    */
  private def taggedObs(s: SparkSession, dir: String): DataFrame =
    taggedObsFor(Alerts.dailyMetrics(Tables.load(s, dir, "events")), interventions(s))

  /** The same period tagging over ANY daily series and ANY interventions
    * frame — the tracker→analyzer composition of the reference
    * (analyzer.py takes `Intervention` records from tracker.py's store):
    * [[graft.sources.ExperimentStore.listInterventions]] output plugs in
    * directly (`id, name, itype, …, start_day, end_day, washout_days`).
    */
  def taggedObsFor(daily: DataFrame, interventionsDf: DataFrame): DataFrame = {
    val maxDay = daily.agg(max("day").as("max_day"))
    val intv = interventionsDf
      .withColumnRenamed("washout_days", "washout")
      .select("id", "name", "itype", "metric", "start_day", "end_day", "washout")
      .crossJoin(broadcast(maxDay))
      .withColumn("pre_start",
        date_format(date_sub(to_date(col("start_day")), preDays), "yyyy-MM-dd"))
      .withColumn("post_end", coalesce(
        date_format(date_add(to_date(col("end_day")), col("washout")), "yyyy-MM-dd"),
        col("max_day")))
    daily.join(broadcast(intv),
        daily("metric") === intv("metric") &&
        col("day") >= col("pre_start") && col("day") <= col("post_end"))
      .withColumn("period", when(col("day") < col("start_day"), "pre").otherwise("post"))
      .select(col("id"), col("name"), col("itype"), col("user_id"),
        col("day"), col("observed"), col("period"))
  }

  /** Conditional decimal-exact moment sums per (intervention, user):
    * n / Σx / Σx² for each period — the sufficient statistics every
    * analyzer below derives from.
    */
  private def momentAgg(obs: DataFrame): DataFrame = {
    def side(p: String) = {
      val v = when(col("period") === p, col("observed"))
      Seq(
        count(v).cast("double").as(s"n_$p"),
        Num.exactSum(v).cast("double").as(s"sx_$p"),
        Num.exactSum(v * v).cast("double").as(s"sxx_$p"))
    }
    val aggs = side("pre") ++ side("post")
    obs.groupBy("id", "name", "itype", "user_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Sample variance from moment sums, ddof=1. */
  private def variance(n: Column, sx: Column, sxx: Column): Column =
    (sxx - sx * sx / n) / (n - lit(1.0))

  /** q76: Normal-Normal conjugate Bayesian pre/post effect per
    * (intervention, entity) — analyzer.py:105-171 exactly: prior
    * N(pre_mean, pre_std²), likelihood variance post_var/n_post,
    * conjugate posterior, the effect = posterior_mean − prior_mean, its
    * 95% credible interval, P(effect > 0) via the portable normal CDF,
    * Cohen's d against the pooled std, and the analyzer's verdict CASE
    * (thresholds at analyzer.py:149-157, evaluated on the same rounded
    * values the row reports).
    *
    * Guards: ≥5 observed days in each period and positive variance on
    * both sides (the reference analyzes one rich entity; across 150
    * sparse synthetic entities the degenerate groups are filtered, not
    * special-cased).
    */
  def q76BayesianEffect(s: SparkSession, dir: String): DataFrame =
    bayesianFor(taggedObs(s, dir))

  /** The full Bayesian battery over any period-tagged observation frame
    * (see [[taggedObsFor]]) — the tracker→analyzer composition entry
    * point.
    */
  def bayesianFor(obs: DataFrame): DataFrame = {
    val m = momentAgg(obs)
      .filter(col("n_pre") >= 5 && col("n_post") >= 5)
      .withColumn("pre_var", variance(col("n_pre"), col("sx_pre"), col("sxx_pre")))
      .withColumn("post_var", variance(col("n_post"), col("sx_post"), col("sxx_post")))
      .filter(col("pre_var") > 0 && col("post_var") > 0)
      .withColumn("pre_mean", col("sx_pre") / col("n_pre"))
      .withColumn("post_mean", col("sx_post") / col("n_post"))
      .withColumn("lik_var", col("post_var") / col("n_post"))
      .withColumn("posterior_var",
        lit(1.0) / (lit(1.0) / col("pre_var") + lit(1.0) / col("lik_var")))
      .withColumn("posterior_mean", col("posterior_var") *
        (col("pre_mean") / col("pre_var") + col("post_mean") / col("lik_var")))
      .withColumn("eff", col("posterior_mean") - col("pre_mean"))
      .withColumn("pstd", sqrt(col("posterior_var")))
      .withColumn("pooled_std", sqrt(
        ((col("n_pre") - 1) * col("pre_var") + (col("n_post") - 1) * col("post_var"))
          / (col("n_pre") + col("n_post") - lit(2.0))))
      .withColumn("effect", Num.roundD(col("eff"), 2))
      .withColumn("ci_low", Num.roundD(col("eff") - lit(1.96) * col("pstd"), 2))
      .withColumn("ci_high", Num.roundD(col("eff") + lit(1.96) * col("pstd"), 2))
      .withColumn("prob_positive", Num.roundD(Num.phi(col("eff") / col("pstd")), 3))
      .withColumn("cohens_d", Num.roundD(col("eff") / col("pooled_std"), 2))

    m.select(
        col("id"), col("name"), col("itype"), col("user_id"),
        col("n_pre").cast("long").as("n_pre"),
        col("n_post").cast("long").as("n_post"),
        Num.roundD(col("pre_mean"), 2).as("pre_mean"),
        Num.roundD(sqrt(col("pre_var")), 2).as("pre_std"),
        Num.roundD(col("post_mean"), 2).as("post_mean"),
        Num.roundD(sqrt(col("post_var")), 2).as("post_std"),
        col("effect"), col("ci_low"), col("ci_high"),
        col("prob_positive"), col("cohens_d"),
        when(abs(col("cohens_d")) < 0.2, "Negligible effect")
          .when(col("ci_low") > 0,
            when(col("cohens_d") > 0.5, "Likely positive effect")
              .otherwise("Small positive effect"))
          .when(col("ci_high") < 0,
            when(col("cohens_d") < -0.5, "Likely negative effect")
              .otherwise("Small negative effect"))
          .otherwise("Inconclusive: effect crosses zero").as("verdict"))
      .orderBy("id", "user_id")
  }

  /** Shared oracle CTE text: daily series → corpus max day → bounded
    * interventions → period-tagged observations → moment sums.
    */
  private val obsCte: String = {
    val values = interventionRows.map { case (i, nm, ty, m, sd, ed, w) =>
      val edSql = ed.map(d => s"'$d'").getOrElse("NULL")
      s"('$i', '$nm', '$ty', '$m', '$sd', $edSql, $w)"
    }.mkString(",\n    ")
    def side(p: String) =
      s"""COUNT(CASE WHEN period = '$p' THEN observed END) AS cnt_$p,
         |    CAST(SUM(CASE WHEN period = '$p' THEN CAST(observed AS DECIMAL(25,6)) END) AS DOUBLE) AS sx_$p,
         |    CAST(SUM(CASE WHEN period = '$p' THEN CAST(observed * observed AS DECIMAL(25,6)) END) AS DOUBLE) AS sxx_$p""".stripMargin
    s"""daily AS (
       |  SELECT user_id, event_type AS metric, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${Num.sqlAvg("value")} AS observed
       |  FROM events GROUP BY 1, 2, 3),
       |mx AS (SELECT MAX(day) AS max_day FROM daily),
       |intv0(id, name, itype, metric, start_day, end_day, washout) AS (VALUES
       |    $values),
       |intv AS (
       |  SELECT intv0.*,
       |    STRFTIME(CAST(start_day AS DATE) - $preDays, '%Y-%m-%d') AS pre_start,
       |    COALESCE(STRFTIME(CAST(end_day AS DATE) + washout, '%Y-%m-%d'), max_day) AS post_end
       |  FROM intv0 CROSS JOIN mx),
       |obs AS (
       |  SELECT i.id, i.name, i.itype, d.user_id, d.day, d.observed,
       |    CASE WHEN d.day < i.start_day THEN 'pre' ELSE 'post' END AS period
       |  FROM daily d JOIN intv i
       |    ON d.metric = i.metric AND d.day BETWEEN i.pre_start AND i.post_end),
       |mom AS (
       |  SELECT id, name, itype, user_id,
       |    ${side("pre")},
       |    ${side("post")}
       |  FROM obs GROUP BY 1, 2, 3, 4)""".stripMargin
  }

  val q76Sql: String = {
    def v(n: String, sx: String, sxx: String) = s"(($sxx - $sx * $sx / $n) / ($n - 1.0))"
    val preVar = v("n_pre", "sx_pre", "sxx_pre")
    val postVar = v("n_post", "sx_post", "sxx_post")
    s"""WITH $obsCte,
       |base AS (
       |  SELECT id, name, itype, user_id,
       |    CAST(cnt_pre AS DOUBLE) AS n_pre, CAST(cnt_post AS DOUBLE) AS n_post,
       |    sx_pre, sxx_pre, sx_post, sxx_post
       |  FROM mom WHERE cnt_pre >= 5 AND cnt_post >= 5),
       |vars AS (
       |  SELECT *, $preVar AS pre_var, $postVar AS post_var,
       |    sx_pre / n_pre AS pre_mean, sx_post / n_post AS post_mean
       |  FROM base WHERE $preVar > 0 AND $postVar > 0),
       |post AS (
       |  SELECT *,
       |    post_var / n_post AS lik_var,
       |    1.0 / (1.0 / pre_var + 1.0 / (post_var / n_post)) AS posterior_var
       |  FROM vars),
       |eff0 AS (
       |  SELECT *,
       |    posterior_var * (pre_mean / pre_var + post_mean / lik_var) - pre_mean AS eff,
       |    SQRT(posterior_var) AS pstd,
       |    SQRT(((n_pre - 1) * pre_var + (n_post - 1) * post_var) / (n_pre + n_post - 2.0)) AS pooled_std
       |  FROM post),
       |eff AS (
       |  SELECT *, eff / pstd AS zc,
       |    ${Num.sqlRoundD("eff", 2)} AS effect,
       |    ${Num.sqlRoundD("eff - 1.96 * pstd", 2)} AS ci_low,
       |    ${Num.sqlRoundD("eff + 1.96 * pstd", 2)} AS ci_high,
       |    ${Num.sqlRoundD("eff / pooled_std", 2)} AS cohens_d
       |  FROM eff0)
       |SELECT id, name, itype, user_id,
       |  CAST(n_pre AS BIGINT) AS n_pre, CAST(n_post AS BIGINT) AS n_post,
       |  ${Num.sqlRoundD("pre_mean", 2)} AS pre_mean,
       |  ${Num.sqlRoundD("SQRT(pre_var)", 2)} AS pre_std,
       |  ${Num.sqlRoundD("post_mean", 2)} AS post_mean,
       |  ${Num.sqlRoundD("SQRT(post_var)", 2)} AS post_std,
       |  effect, ci_low, ci_high,
       |  ${Num.sqlRoundD(Num.sqlPhi("zc"), 3)} AS prob_positive,
       |  cohens_d,
       |  CASE
       |    WHEN ABS(cohens_d) < 0.2 THEN 'Negligible effect'
       |    WHEN ci_low > 0 THEN
       |      CASE WHEN cohens_d > 0.5 THEN 'Likely positive effect'
       |           ELSE 'Small positive effect' END
       |    WHEN ci_high < 0 THEN
       |      CASE WHEN cohens_d < -0.5 THEN 'Likely negative effect'
       |           ELSE 'Small negative effect' END
       |    ELSE 'Inconclusive: effect crosses zero' END AS verdict
       |FROM eff
       |ORDER BY id, user_id""".stripMargin
  }

  /** q77: difference-in-differences per (intervention, entity) —
    * analyzer.py:174-226 exactly: OLS trend over the pre period indexed
    * by OBSERVATION ORDER (np.arange over rows, not calendar days —
    * analyzer.py:189), counterfactual = the trend extrapolated across the
    * post rows (the mean of intercept + slope·x over x = n_pre …
    * n_pre+n_post−1 collapses to intercept + slope·(n_pre +
    * (n_post−1)/2) — no per-row join needed), DiD effect = actual −
    * counterfactual, parallel-trends validity r² > 0.3, and the two
    * warning branches (<3 pre rows at :191-199, non-linear trend at
    * :205-207). The <3-pre-rows early return is a CASE, not a filter —
    * those rows ship with the reference's zeroed statistics.
    */
  def q77DidCounterfactual(s: SparkSession, dir: String): DataFrame = {
    val obs = taggedObs(s, dir)
    val xIdx = row_number().over(
      Window.partitionBy("id", "user_id", "period").orderBy("day")) - lit(1)
    val withX = obs.withColumn("x", xIdx.cast("double"))

    val pre = when(col("period") === "pre", lit(1))
    val post = when(col("period") === "post", lit(1))
    val yPre = when(col("period") === "pre", col("observed"))
    val yPost = when(col("period") === "post", col("observed"))
    val g = withX.groupBy("id", "name", "user_id").agg(
      count(pre).cast("double").as("n_pre"),
      count(post).cast("double").as("n_post"),
      coalesce(Num.exactSum(when(col("period") === "pre", col("x"))).cast("double"), lit(0.0)).as("sx"),
      coalesce(Num.exactSum(when(col("period") === "pre", col("x") * col("x"))).cast("double"), lit(0.0)).as("sxx"),
      coalesce(Num.exactSum(yPre).cast("double"), lit(0.0)).as("sy"),
      coalesce(Num.exactSum(when(col("period") === "pre", col("x") * col("observed"))).cast("double"), lit(0.0)).as("sxy"),
      coalesce(Num.exactSum(yPre * yPre).cast("double"), lit(0.0)).as("syy"),
      Num.exactSum(yPost).cast("double").as("sy_post"))
      .filter(col("n_pre") >= 1 && col("n_post") >= 1)

    val denX = col("n_pre") * col("sxx") - col("sx") * col("sx")
    val denY = col("n_pre") * col("syy") - col("sy") * col("sy")
    val num = col("n_pre") * col("sxy") - col("sx") * col("sy")
    val enough = col("n_pre") >= 3
    val slopeRaw = num / denX
    val interceptRaw = (col("sy") - slopeRaw * col("sx")) / col("n_pre")
    val r2Raw = when(denY > 0, num * num / (denX * denY)).otherwise(lit(0.0))
    val cfRaw = interceptRaw + slopeRaw * (col("n_pre") + (col("n_post") - 1) / lit(2.0))

    val d = g
      .withColumn("actual_post_mean", Num.roundD(col("sy_post") / col("n_post"), 2))
      .withColumn("pre_trend_slope", when(enough, Num.roundD(slopeRaw, 4)).otherwise(lit(0.0)))
      .withColumn("pre_trend_r2", when(enough, Num.roundD(r2Raw, 3)).otherwise(lit(0.0)))
      .withColumn("counterfactual_post_mean",
        when(enough, Num.roundD(cfRaw, 2))
          .otherwise(when(col("n_pre") > 0, Num.roundD(col("sy") / col("n_pre"), 2)).otherwise(lit(0.0))))
      .withColumn("did_effect",
        when(enough, Num.roundD(col("actual_post_mean") - cfRaw, 2)).otherwise(lit(0.0)))
      .withColumn("parallel_trends_valid",
        (enough && col("pre_trend_r2") > 0.3).cast("int"))
      .withColumn("warning",
        when(!enough, "Too few pre-period observations (< 3) for DiD analysis")
          .when(col("pre_trend_r2") <= 0.3,
            "Pre-period trend is non-linear - DiD results may be unreliable"))

    d.select(col("id"), col("name"), col("user_id"),
        col("n_pre").cast("long").as("n_pre"), col("n_post").cast("long").as("n_post"),
        col("pre_trend_slope"), col("pre_trend_r2"),
        col("counterfactual_post_mean"), col("actual_post_mean"),
        col("did_effect"), col("parallel_trends_valid"), col("warning"))
      .orderBy("id", "user_id")
  }

  val q77Sql: String = {
    val denX = "(n_pre * sxx - sx * sx)"
    val denY = "(n_pre * syy - sy * sy)"
    val num = "(n_pre * sxy - sx * sy)"
    val slope = s"($num / $denX)"
    val intercept = s"((sy - $slope * sx) / n_pre)"
    val r2 = s"(CASE WHEN $denY > 0 THEN $num * $num / ($denX * $denY) ELSE 0.0 END)"
    val cf = s"($intercept + $slope * (n_pre + (n_post - 1) / 2.0))"
    s"""WITH $obsCte,
       |wx AS (
       |  SELECT id, name, user_id, period, observed,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY id, user_id, period ORDER BY day) - 1 AS DOUBLE) AS x
       |  FROM obs),
       |g AS (
       |  SELECT id, name, user_id,
       |    CAST(COUNT(CASE WHEN period = 'pre' THEN 1 END) AS DOUBLE) AS n_pre,
       |    CAST(COUNT(CASE WHEN period = 'post' THEN 1 END) AS DOUBLE) AS n_post,
       |    COALESCE(CAST(SUM(CASE WHEN period = 'pre' THEN CAST(x AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS sx,
       |    COALESCE(CAST(SUM(CASE WHEN period = 'pre' THEN CAST(x * x AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS sxx,
       |    COALESCE(CAST(SUM(CASE WHEN period = 'pre' THEN CAST(observed AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS sy,
       |    COALESCE(CAST(SUM(CASE WHEN period = 'pre' THEN CAST(x * observed AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS sxy,
       |    COALESCE(CAST(SUM(CASE WHEN period = 'pre' THEN CAST(observed * observed AS DECIMAL(25,6)) END) AS DOUBLE), 0.0) AS syy,
       |    CAST(SUM(CASE WHEN period = 'post' THEN CAST(observed AS DECIMAL(25,6)) END) AS DOUBLE) AS sy_post
       |  FROM wx GROUP BY 1, 2, 3
       |  HAVING COUNT(CASE WHEN period = 'pre' THEN 1 END) >= 1
       |     AND COUNT(CASE WHEN period = 'post' THEN 1 END) >= 1),
       |d AS (
       |  SELECT *,
       |    ${Num.sqlRoundD("sy_post / n_post", 2)} AS actual_post_mean,
       |    CASE WHEN n_pre >= 3 THEN ${Num.sqlRoundD(slope, 4)} ELSE 0.0 END AS pre_trend_slope,
       |    CASE WHEN n_pre >= 3 THEN ${Num.sqlRoundD(r2, 3)} ELSE 0.0 END AS pre_trend_r2,
       |    CASE WHEN n_pre >= 3 THEN ${Num.sqlRoundD(cf, 2)}
       |         WHEN n_pre > 0 THEN ${Num.sqlRoundD("sy / n_pre", 2)} ELSE 0.0 END AS counterfactual_post_mean,
       |    CASE WHEN n_pre >= 3 THEN ${Num.sqlRoundD(s"${Num.sqlRoundD("sy_post / n_post", 2)} - $cf", 2)}
       |         ELSE 0.0 END AS did_effect
       |  FROM g)
       |SELECT id, name, user_id,
       |  CAST(n_pre AS BIGINT) AS n_pre, CAST(n_post AS BIGINT) AS n_post,
       |  pre_trend_slope, pre_trend_r2, counterfactual_post_mean,
       |  actual_post_mean, did_effect,
       |  CAST(n_pre >= 3 AND pre_trend_r2 > 0.3 AS INT) AS parallel_trends_valid,
       |  CASE WHEN n_pre < 3 THEN 'Too few pre-period observations (< 3) for DiD analysis'
       |       WHEN pre_trend_r2 <= 0.3 THEN 'Pre-period trend is non-linear - DiD results may be unreliable'
       |  END AS warning
       |FROM d
       |ORDER BY id, user_id""".stripMargin
  }

  /** q78: the Pearson correlation panel per entity — correlation_analysis
    * (analyzer.py:309-390) with lag_days=1 over (input = a day's purchase
    * intensity, outcome = the next OBSERVED day's view score; the
    * reference's pandas `shift(-lag)` is row-order, not calendar —
    * analyzer.py:349-352 — and the pairing here matches it), plus the
    * sleep_readiness insight's regression stats (sleep_readiness.py:
    * 58-82: slope, intercept, slope std-err, strength/direction labels).
    *
    * r, slope, intercept, and the slope std-err are closed forms over
    * decimal-exact sums; the two-tailed p-value uses the NORMAL
    * approximation to the t distribution via [[Num.phi]] (the exact t CDF
    * is an incomplete beta neither engine exposes as portable
    * arithmetic; at the n≈13 typical here the approximation is loose —
    * the column is named p_value_z to say so). `rolling_r_latest` is the
    * reference's 14-row rolling correlation (analyzer.py:366-375)
    * evaluated at the newest pair, NULL under 7 observations
    * (min_periods = max(window/2, 5)).
    */
  def q78CorrelationPanel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    val pairs = Windows.dailyRollup(s, dir)
      .withColumn("y", lead("view_score", 1).over(w))
      .filter(col("purchase_total").isNotNull && col("y").isNotNull)
      .select(col("user_id"), col("day"), col("purchase_total").as("x"), col("y"))

    val wRoll = Window.partitionBy("user_id").orderBy("day").rowsBetween(-13, Window.currentRow)
    val wDesc = Window.partitionBy("user_id").orderBy(col("day").desc)
    def rollSum(c: Column) = Num.exactSum(c).over(wRoll).cast("double")
    val rn = count(lit(1)).over(wRoll).cast("double")
    val rsx = rollSum(col("x")); val rsy = rollSum(col("y"))
    val rsxx = rollSum(col("x") * col("x")); val rsyy = rollSum(col("y") * col("y"))
    val rsxy = rollSum(col("x") * col("y"))
    val rNum = rn * rsxy - rsx * rsy
    val rDen = (rn * rsxx - rsx * rsx) * (rn * rsyy - rsy * rsy)
    // the rolling stat rides the SAME windowed pass as the panel sums:
    // max(when(rn_desc = 1, roll_r)) picks the newest pair's rolling r
    // (null included — every other row contributes null) without the
    // second scan + self-join a separate latest-row branch would cost
    val rolled = pairs
      .withColumn("roll_r", when(rn >= 7 && rDen > 0, Num.roundD(rNum / sqrt(rDen), 4)))
      .withColumn("rn_desc", row_number().over(wDesc))

    val g = rolled.groupBy("user_id").agg(
      count(lit(1)).cast("double").as("n"),
      Num.exactSum(col("x")).cast("double").as("sx"),
      Num.exactSum(col("y")).cast("double").as("sy"),
      Num.exactSum(col("x") * col("x")).cast("double").as("sxx"),
      Num.exactSum(col("y") * col("y")).cast("double").as("syy"),
      Num.exactSum(col("x") * col("y")).cast("double").as("sxy"),
      max(when(col("rn_desc") === 1, col("roll_r"))).as("rolling_r_latest"))
      .filter(col("n") >= 5)

    val sxxC = col("sxx") - col("sx") * col("sx") / col("n")
    val syyC = col("syy") - col("sy") * col("sy") / col("n")
    val sxyC = col("sxy") - col("sx") * col("sy") / col("n")
    val stats = g.filter(sxxC > 0 && syyC > 0)
      .withColumn("r_raw", sxyC / sqrt(sxxC * syyC))
      .withColumn("slope_raw", sxyC / sxxC)
      .withColumn("se_raw", sqrt(greatest(lit(0.0), syyC - (sxyC / sxxC) * sxyC) / ((col("n") - 2) * sxxC)))
      .withColumn("t_raw",
        when(lit(1.0) - col("r_raw") * col("r_raw") > 0,
          col("r_raw") * sqrt((col("n") - 2) / (lit(1.0) - col("r_raw") * col("r_raw")))))
      .withColumn("r", Num.roundD(col("r_raw"), 4))
      .withColumn("p_value_z",
        Num.roundD(lit(2.0) * (lit(1.0) - Num.phi(abs(col("t_raw")))), 4))

    stats
      .select(
        col("user_id"), col("n").cast("long").as("n"),
        col("r"), Num.roundD(col("r_raw") * col("r_raw"), 4).as("r_squared"),
        Num.roundD(col("slope_raw"), 4).as("slope"),
        Num.roundD((col("sy") - col("slope_raw") * col("sx")) / col("n"), 4).as("intercept"),
        Num.roundD(col("se_raw"), 4).as("std_err"),
        Num.roundD(col("t_raw"), 4).as("t_stat"),
        col("p_value_z"),
        (col("p_value_z") < 0.05).cast("int").as("significant"),
        when(abs(col("r")) < 0.1, "negligible")
          .when(abs(col("r")) < 0.3, "weak")
          .when(abs(col("r")) < 0.5, "moderate")
          .when(abs(col("r")) < 0.7, "strong")
          .otherwise("very strong").as("strength"),
        when(col("r") > 0, "positive").otherwise("negative").as("direction"),
        col("rolling_r_latest"))
      .orderBy("user_id")
  }

  /** The q12 gold rollup as an oracle CTE (the dbt-style ref Predictive
    * uses), named rollup12 to avoid colliding with obsCte's names.
    */
  private val rollup12Cte: String = s"rollup12 AS (\n${Windows.q12Sql}\n)"

  val q78Sql: String = {
    val sxxC = "(sxx - sx * sx / n)"
    val syyC = "(syy - sy * sy / n)"
    val sxyC = "(sxy - sx * sy / n)"
    val rRaw = s"($sxyC / SQRT($sxxC * $syyC))"
    val slopeRaw = s"($sxyC / $sxxC)"
    val wRoll = "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
    def rollSum(e: String) = s"CAST(SUM(CAST(($e) AS DECIMAL(25,6))) $wRoll AS DOUBLE)"
    val rn = s"CAST(COUNT(*) $wRoll AS DOUBLE)"
    val rNum = s"($rn * ${rollSum("x * y")} - ${rollSum("x")} * ${rollSum("y")})"
    val rDen = s"(($rn * ${rollSum("x * x")} - ${rollSum("x")} * ${rollSum("x")}) * ($rn * ${rollSum("y * y")} - ${rollSum("y")} * ${rollSum("y")}))"
    s"""WITH $rollup12Cte,
       |pairs AS (
       |  SELECT user_id, day, purchase_total AS x,
       |    LEAD(view_score, 1) OVER (PARTITION BY user_id ORDER BY day) AS y
       |  FROM rollup12),
       |pairs2 AS (SELECT * FROM pairs WHERE x IS NOT NULL AND y IS NOT NULL),
       |rolled AS (
       |  SELECT user_id, day,
       |    CASE WHEN $rn >= 7 AND $rDen > 0
       |      THEN ${Num.sqlRoundD(s"$rNum / SQRT($rDen)")} END AS roll_r,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day DESC) AS rn_desc
       |  FROM pairs2),
       |latest_roll AS (SELECT user_id, roll_r AS rolling_r_latest FROM rolled WHERE rn_desc = 1),
       |g AS (
       |  SELECT user_id,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(y AS DECIMAL(25,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(x * x AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(y * y AS DECIMAL(25,6))) AS DOUBLE) AS syy,
       |    CAST(SUM(CAST(x * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy
       |  FROM pairs2 GROUP BY 1 HAVING COUNT(*) >= 5),
       |stats AS (
       |  SELECT *, $rRaw AS r_raw, $slopeRaw AS slope_raw,
       |    SQRT(GREATEST(0.0, $syyC - $slopeRaw * $sxyC) / ((n - 2) * $sxxC)) AS se_raw,
       |    CASE WHEN 1.0 - $rRaw * $rRaw > 0
       |      THEN $rRaw * SQRT((n - 2) / (1.0 - $rRaw * $rRaw)) END AS t_raw
       |  FROM g WHERE $sxxC > 0 AND $syyC > 0),
       |stats2 AS (
       |  SELECT *, ${Num.sqlRoundD("r_raw")} AS r, ABS(t_raw) AS at,
       |    (sy - slope_raw * sx) / n AS intercept_raw
       |  FROM stats),
       |stats3 AS (
       |  SELECT *, ${Num.sqlRoundD(s"2.0 * (1.0 - ${Num.sqlPhi("at")})")} AS p_value_z
       |  FROM stats2)
       |SELECT s.user_id, CAST(s.n AS BIGINT) AS n, s.r,
       |  ${Num.sqlRoundD("s.r_raw * s.r_raw")} AS r_squared,
       |  ${Num.sqlRoundD("s.slope_raw")} AS slope,
       |  ${Num.sqlRoundD("s.intercept_raw")} AS intercept,
       |  ${Num.sqlRoundD("s.se_raw")} AS std_err,
       |  ${Num.sqlRoundD("s.t_raw")} AS t_stat,
       |  s.p_value_z,
       |  CAST(s.p_value_z < 0.05 AS INT) AS significant,
       |  CASE WHEN ABS(s.r) < 0.1 THEN 'negligible'
       |       WHEN ABS(s.r) < 0.3 THEN 'weak'
       |       WHEN ABS(s.r) < 0.5 THEN 'moderate'
       |       WHEN ABS(s.r) < 0.7 THEN 'strong'
       |       ELSE 'very strong' END AS strength,
       |  CASE WHEN s.r > 0 THEN 'positive' ELSE 'negative' END AS direction,
       |  lr.rolling_r_latest
       |FROM stats3 s LEFT JOIN latest_roll lr ON s.user_id = lr.user_id
       |ORDER BY s.user_id""".stripMargin
  }
}
