package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics layer: training-load windows, z-score anomaly detection,
  * Spearman lag-correlation, data-quality assertions, timestamp/JSON
  * normalization, record→JSON construction, tumbling-window rollups.
  *
  * Re-expresses the reference's insights engine + dbt analytics models
  * (reference: insights_engine/insights/training_load.py:21-41,
  * insights/anomaly_detection.py:22-98, insights/correlation_discovery.py:380-442,
  * dbt .../features/feature_readiness_daily.sql:60-92,
  * dbt .../tests/assert_readiness_score_range.sql, glue/bio_etl_utils.py:135-155,
  * glue/fhir_observation_builder.py, lambda/health_alerts/handler.py).
  *
  * Everything is expressed as per-entity windows or single-shuffle
  * aggregations — no driver-side pandas loops (the reference pulls series
  * into pandas; at 100 TB that is the part that cannot survive).
  */
object Analytics {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Deterministic epoch-day string for a ts. */
  private val dayCol: Column = date_format(col("ts"), "yyyy-MM-dd")

  /** q13: training-load CTL/ATL/TSB — chronic (42-sample) and acute
    * (7-sample) rolling means of daily load, and their lagged balance
    * (reference: training_load.py:21-41 true EMA; feature_readiness_daily
    * .sql:70-78 windowed approximation — this is the windowed form; the
    * exact EMA lives in [[graft.operators.TrainingLoad]] with a ScalaTest).
    */
  def q13TrainingLoad(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), dayCol.as("day"))
      .agg(Num.sumD(col("value"), 2).as("daily_load"))
    val seq = Window.partitionBy("user_id").orderBy("day")
    val ctlF = seq.rowsBetween(-41, Window.currentRow)
    val atlF = seq.rowsBetween(-6, Window.currentRow)
    def rollAvg(f: org.apache.spark.sql.expressions.WindowSpec): Column =
      Num.roundD(Num.exactSum(col("daily_load")).over(f).cast("double")
        / count(lit(1)).over(f))
    daily
      .withColumn("ctl", rollAvg(ctlF))
      .withColumn("atl", rollAvg(atlF))
      .withColumn("tsb", Num.roundD(lag("ctl", 1).over(seq) - lag("atl", 1).over(seq)))
      .orderBy("user_id", "day")
  }

  val q13Sql: String = {
    val ctlF = "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 41 PRECEDING AND CURRENT ROW)"
    val atlF = "OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    def rollAvg(f: String) =
      Num.sqlRoundD(s"CAST(SUM(CAST(daily_load AS DECIMAL(25,6))) $f AS DOUBLE) / COUNT(*) $f")
    s"""WITH daily AS (
       |  SELECT user_id, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${Num.sqlSum("value", 2)} AS daily_load
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |rolled AS (
       |  SELECT user_id, day, daily_load,
       |    ${rollAvg(ctlF)} AS ctl,
       |    ${rollAvg(atlF)} AS atl
       |  FROM daily)
       |SELECT user_id, day, daily_load, ctl, atl,
       |  ${Num.sqlRoundD("LAG(ctl, 1) OVER w - LAG(atl, 1) OVER w")} AS tsb
       |FROM rolled
       |WINDOW w AS (PARTITION BY user_id ORDER BY day)
       |ORDER BY user_id, day""".stripMargin
  }

  /** q14: z-score anomaly detection vs a trailing rolling baseline
    * (reference: anomaly_detection.py:22-98 — |z| > 2.5 vs the prior-30
    * window, min 5 samples). Variance is computed from decimal-exact
    * Σx / Σx² (not stddev_samp) so both engines derive the identical
    * double — engine-native variance uses order-dependent streaming
    * algorithms that diverge in the last ulps.
    */
  def q14AnomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id")).rowsBetween(-30, -1)
    val n = count(col("value")).over(base).cast("double")
    val sx = Num.exactSum(col("value")).over(base).cast("double")
    val sxx = Num.exactSum(col("value") * col("value")).over(base).cast("double")
    val mean = sx / n
    // conditional so the division never sees n ∈ {0, 1}: ANSI mode
    // (Spark 4 default) raises DIVIDE_BY_ZERO even for doubles, and the
    // filter's base_var reference evaluates this for every row
    val variance = when(n > 1, (sxx - sx * sx / n) / (n - lit(1.0)))
    val z = (col("value") - mean) / sqrt(variance)
    events(s, dir)
      .withColumn("n_base", n)
      .withColumn("base_var", variance)
      .withColumn("baseline_mean", Num.roundD(mean))
      .withColumn("z", Num.roundD(z, 3))
      // base_var > 0 guards the constant-baseline case: z would be ±Inf
      // and Spark's long-based floor-round of Inf diverges from DuckDB's
      .filter(col("n_base") >= 5 && col("base_var") > 0 && abs(col("z")) > 2.5)
      .select("event_id", "user_id", "event_type", "value", "baseline_mean", "z")
      .orderBy("event_id")
  }

  val q14Sql: String = {
    val f = "OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id " +
      "ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)"
    s"""WITH b AS (
       |  SELECT event_id, user_id, event_type, value,
       |    CAST(COUNT(value) $f AS DOUBLE) AS n,
       |    CAST(SUM(CAST(value AS DECIMAL(25,6))) $f AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(value * value AS DECIMAL(25,6))) $f AS DOUBLE) AS sxx
       |  FROM events)
       |SELECT event_id, user_id, event_type, value,
       |  ${Num.sqlRoundD("sx / n")} AS baseline_mean,
       |  ${Num.sqlRoundD("(value - sx / n) / SQRT((sxx - sx * sx / n) / (n - 1.0))", 3)} AS z
       |FROM b
       |WHERE n >= 5
       |  AND (sxx - sx * sx / n) / (n - 1.0) > 0
       |  AND ABS(${Num.sqlRoundD("(value - sx / n) / SQRT((sxx - sx * sx / n) / (n - 1.0))", 3)}) > 2.5
       |ORDER BY event_id""".stripMargin
  }

  /** q15: Spearman lag-correlation scan — does today's view score predict
    * purchase spend 0..3 days later? (reference: correlation_discovery
    * .py:380-442 — metric-pair × lag grid, Spearman via ranks.)
    *
    * Ranks use the average-rank (midrank) formulation computed via groupBy
    * on value: per-(lag, value) counts plus one cumulative sum over the
    * DISTINCT-value frame. That frame's cardinality is bounded by the
    * rounded value domain (4dp doubles in a bounded metric range), NOT by
    * the data — unlike a per-row ROW_NUMBER window, which would globally
    * sort the whole (user×day) pair grid inside one partition per lag and
    * die at fleet scale. Doubled ranks (2·avg_rank, always integral) keep
    * every sum exact in integers; Pearson-on-ranks is invariant under the
    * per-variable 2× scaling, so rho is unchanged. rho then comes from the
    * closed-form Pearson-on-ranks formula over decimal-exact sums — no
    * engine corr() whose streaming accumulation differs.
    * Scale: the lag grid is a 4-row broadcast; pairs co-shuffle on
    * (user_id, day); rank tables join back on (lag, value).
    */
  def q15SpearmanLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one scan + one shuffle: both metrics' daily averages come from a
    // single conditional aggregation (see q12 for the fusion rationale)
    val daily = events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(
        Num.avgD(when(col("event_type") === "view", col("value"))).as("a_val"),
        Num.avgD(when(col("event_type") === "purchase", col("value"))).as("b_val"))
    val a = daily.filter(col("a_val").isNotNull)
      .select(col("user_id").as("a_uid"), col("d").as("a_d"), col("a_val"))
    val b = daily.filter(col("b_val").isNotNull)
      .select(col("user_id").as("b_uid"), col("d").as("b_d"), col("b_val"))
    val lags = Seq(0, 1, 2, 3).toDF("lag")
    val pairs = a.crossJoin(broadcast(lags))
      .join(b,
        col("a_uid") === col("b_uid") &&
          col("b_d") === date_add(col("a_d"), col("lag")))
      .select(col("lag"), col("a_uid").as("user_id"), col("a_d").as("d"),
        col("a_val"), col("b_val"))
      .persist()
    // eager: `pairs` feeds three subtrees (both rank tables + the ranked
    // join); left cold, each re-runs the daily-agg + lag-join pipeline
    pairs.count()
    // midrank table per side: doubled average rank 2·cum - cnt + 1 over
    // the distinct-value frame (one partial-aggregated groupBy; the
    // cumulative window's input is domain-bounded, see scaladoc)
    def rankTable(valCol: String, rankCol: String): DataFrame = {
      val w = Window.partitionBy("lag").orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pairs.groupBy(col("lag"), col(valCol)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .select(col("lag"), col(valCol),
          (lit(2L) * col("cum") - col("cnt") + lit(1L)).as(rankCol))
    }
    val ranked = pairs
      .join(rankTable("a_val", "ra"), Seq("lag", "a_val"))
      .join(rankTable("b_val", "rb"), Seq("lag", "b_val"))
    val rho = (col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
      sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
        (col("n_pairs") * col("syy") - col("sy") * col("sy")))
    // Bonferroni-corrected significance over the 4-lag scan family
    // (reference: correlation_discovery.py:253-340 — per-family alpha).
    // t = rho·sqrt((n-2)/(1-rho²)); threshold 3.0 ≈ two-sided alpha
    // 0.01/4 for the n here, as a deterministic in-plan cut.
    val tStat = rho * sqrt((col("n_pairs") - 2) / (lit(1.0) - rho * rho))
    // rank products grow as O(n³) summed — exact decimal accumulation, not
    // silently-overflowing longs
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    ranked.groupBy("lag")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("ra").cast(dec) * col("rb").cast(dec)).cast("double").as("sxy"),
        sum(col("ra").cast(dec)).cast("double").as("sx"),
        sum(col("rb").cast(dec)).cast("double").as("sy"),
        sum(col("ra").cast(dec) * col("ra").cast(dec)).cast("double").as("sxx"),
        sum(col("rb").cast(dec) * col("rb").cast(dec)).cast("double").as("syy"))
      .select(col("lag"), col("n_pairs"),
        Num.roundD(rho).as("spearman_rho"),
        Num.roundD(tStat, 3).as("t_stat"),
        (abs(Num.roundD(tStat, 3)) > 3.0).cast("int").as("significant_bonferroni"))
      .orderBy("lag")
  }

  val q15Sql: String =
    s"""WITH a AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d, ${Num.sqlAvg("value")} AS a_val
       |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
       |b AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d, ${Num.sqlAvg("value")} AS b_val
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |pairs AS (
       |  SELECT l.lag, a.user_id, a.d, a.a_val, b.b_val
       |  FROM a CROSS JOIN (VALUES (0), (1), (2), (3)) AS l(lag)
       |  JOIN b ON b.user_id = a.user_id AND b.d = a.d + l.lag * INTERVAL 1 DAY),
       |acnt AS (SELECT lag, a_val, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
       |arank AS (
       |  SELECT lag, a_val,
       |    2 * SUM(cnt) OVER (PARTITION BY lag ORDER BY a_val
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS ra
       |  FROM acnt),
       |bcnt AS (SELECT lag, b_val, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
       |brank AS (
       |  SELECT lag, b_val,
       |    2 * SUM(cnt) OVER (PARTITION BY lag ORDER BY b_val
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS rb
       |  FROM bcnt),
       |ranked AS (
       |  SELECT p.lag, ar.ra, br.rb
       |  FROM pairs p
       |  JOIN arank ar ON ar.lag = p.lag AND ar.a_val = p.a_val
       |  JOIN brank br ON br.lag = p.lag AND br.b_val = p.b_val),
       |sums AS (
       |  SELECT lag, COUNT(*) AS n_pairs,
       |    CAST(SUM(ra * rb) AS DOUBLE) AS sxy,
       |    CAST(SUM(ra) AS DOUBLE) AS sx, CAST(SUM(rb) AS DOUBLE) AS sy,
       |    CAST(SUM(ra * ra) AS DOUBLE) AS sxx, CAST(SUM(rb * rb) AS DOUBLE) AS syy
       |  FROM ranked GROUP BY lag),
       |stats AS (
       |  SELECT lag, n_pairs,
       |    (n_pairs * sxy - sx * sy) / SQRT((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy)) AS rho
       |  FROM sums)
       |SELECT lag, n_pairs,
       |  ${Num.sqlRoundD("rho")} AS spearman_rho,
       |  ${Num.sqlRoundD("rho * SQRT((n_pairs - 2) / (1.0 - rho * rho))", 3)} AS t_stat,
       |  CAST(ABS(${Num.sqlRoundD("rho * SQRT((n_pairs - 2) / (1.0 - rho * rho))", 3)}) > 3.0 AS INT) AS significant_bonferroni
       |FROM stats
       |ORDER BY lag""".stripMargin

  /** q31: linear-impact regression — OLS slope/intercept/r² of daily
    * purchase spend on daily view score, the "what would +1 view-score do
    * to spend" scenario model
    * (reference: insights_engine/insights/what_if.py linear scenario fits,
    * dbt .../analytics/readiness_performance_correlation.sql). Closed-form
    * OLS from decimal-exact sums — one scan, one shuffle, no MLlib
    * iteration for a 2-parameter fit.
    */
  def q31LinearImpact(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(
        Num.avgD(when(col("event_type") === "view", col("value"))).as("x"),
        Num.sumD(when(col("event_type") === "purchase", col("value")), 2).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val sums = daily.agg(
      count(lit(1)).cast("double").as("n"),
      Num.exactSum(col("x")).cast("double").as("sx"),
      Num.exactSum(col("y")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast(org.apache.spark.sql.types.DataTypes.createDecimalType(25, 6)))
        .cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(org.apache.spark.sql.types.DataTypes.createDecimalType(25, 6)))
        .cast("double").as("sxx"),
      sum((col("y") * col("y")).cast(org.apache.spark.sql.types.DataTypes.createDecimalType(25, 6)))
        .cast("double").as("syy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val r = (col("n") * col("sxy") - col("sx") * col("sy")) /
      sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
        (col("n") * col("syy") - col("sy") * col("sy")))
    sums.select(
      col("n").cast("long").as("n_pairs"),
      Num.roundD(slope).as("slope"),
      Num.roundD((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
      Num.roundD(r * r).as("r2"))
  }

  val q31Sql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS d,
       |    ${Num.sqlAvg("CASE WHEN event_type = 'view' THEN value END")} AS x,
       |    ${Num.sqlSum("CASE WHEN event_type = 'purchase' THEN value END", 2)} AS y
       |  FROM events WHERE event_type IN ('view', 'purchase')
       |  GROUP BY 1, 2),
       |pairs AS (SELECT x, y FROM daily WHERE x IS NOT NULL AND y IS NOT NULL),
       |s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(y AS DECIMAL(25,6))) AS DOUBLE) AS sy,
       |    CAST(SUM(CAST(x * y AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
       |    CAST(SUM(CAST(x * x AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
       |    CAST(SUM(CAST(y * y AS DECIMAL(25,6))) AS DOUBLE) AS syy
       |  FROM pairs),
       |derived AS (
       |  SELECT n,
       |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_raw,
       |    (n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r_raw,
       |    sx, sy
       |  FROM s)
       |SELECT CAST(n AS BIGINT) AS n_pairs,
       |  ${Num.sqlRoundD("slope_raw")} AS slope,
       |  ${Num.sqlRoundD("(sy - slope_raw * sx) / n")} AS intercept,
       |  ${Num.sqlRoundD("r_raw * r_raw")} AS r2
       |FROM derived""".stripMargin

  /** q32: exact percentile profile per event_type — p50/p90/p99 latency-
    * style stats (reference: weekly/summary distributions; the insights
    * engine reports quartiles via pandas describe()). Exact interpolated
    * percentiles (both engines implement the same linear-interpolation
    * definition); at 100 TB swap in approx_percentile with a documented
    * error bound — the query shape is identical.
    */
  def q32Percentiles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        Num.roundD(expr("percentile(value, 0.5)")).as("p50"),
        Num.roundD(expr("percentile(value, 0.9)")).as("p90"),
        Num.roundD(expr("percentile(value, 0.99)")).as("p99"))
      .orderBy("event_type")

  val q32Sql: String =
    s"""SELECT event_type, COUNT(*) AS n,
       |  ${Num.sqlRoundD("quantile_cont(value, 0.5)")} AS p50,
       |  ${Num.sqlRoundD("quantile_cont(value, 0.9)")} AS p90,
       |  ${Num.sqlRoundD("quantile_cont(value, 0.99)")} AS p99
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** q43: approx-percentile profile — the registered 100 TB variant of
    * q32. `approx_percentile` (Greenwald-Khanna sketch) is single-pass and
    * bounded-memory per group — rank error ≤ 1/accuracy — where q32's
    * exact `percentile` buffers every group value in executor memory and
    * dies on a hot group at fleet scale. Same query shape, swappable
    * output. Sketch results are engine-specific, so this row is
    * driver-checked rows-only; ApproxPercentileSpec asserts each
    * approximate quantile lands within the sketch's rank-error bound of
    * the exact distribution (q32 stays the oracle-checked exact form).
    */
  def q43PercentilesApprox(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        Num.roundD(expr(s"approx_percentile(value, 0.5, $ApproxAccuracy)")).as("p50"),
        Num.roundD(expr(s"approx_percentile(value, 0.9, $ApproxAccuracy)")).as("p90"),
        Num.roundD(expr(s"approx_percentile(value, 0.99, $ApproxAccuracy)")).as("p99"))
      .orderBy("event_type")

  /** Sketch accuracy for q43: guaranteed rank error ≤ 1/accuracy. */
  val ApproxAccuracy: Int = 1000

  /** q33: value-distribution histogram — fixed-width buckets per
    * event_type (reference: viz layer histograms over daily metrics).
    * width_bucket is a row-local expression, so the histogram is one
    * partial-aggregated shuffle regardless of scale.
    */
  def q33Histogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .withColumn("bucket",
        when(col("value") < 0, 0)
          .when(col("value") >= 100, 11)
          .otherwise(floor(col("value") / 10.0) + 1).cast("int"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        Num.roundD(min("value")).as("lo"),
        Num.roundD(max("value")).as("hi"))
      .orderBy("event_type", "bucket")

  val q33Sql: String =
    s"""SELECT event_type,
       |  CAST(CASE WHEN value < 0 THEN 0 WHEN value >= 100 THEN 11
       |            ELSE FLOOR(value / 10.0) + 1 END AS INT) AS bucket,
       |  COUNT(*) AS n,
       |  ${Num.sqlRoundD("MIN(value)")} AS lo,
       |  ${Num.sqlRoundD("MAX(value)")} AS hi
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY event_type, bucket""".stripMargin

  /** q16: data-quality assertion battery — each row is one check and its
    * violation count, 0 meaning the assertion holds
    * (reference: dbt .../tests/assert_readiness_score_range.sql,
    * assert_no_future_dates.sql — dbt tests are SELECTs whose rows are
    * failures). FK checks are left-anti joins (broadcast the PK side when
    * small); never a NOT IN subquery that materializes on the driver.
    */
  def q16QualityAsserts(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val l = Tables.load(s, dir, "lineitem")
    def check(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    // scalar predicate checks over one table fuse into a single scan of
    // conditional counts, unpivoted to (check_name, n_violations); only
    // checks needing their own shuffle shape (dup groupBy, anti-joins)
    // scan separately
    val eScalar = e.agg(
        count(when(col("value") < 0 || col("value") > 1e6, 1)).as("events_value_range"),
        count(when(col("ts") > lit("2026-01-01").cast("timestamp"), 1)).as("events_future_ts"))
      .unpivot(Array.empty, Array(col("events_value_range"), col("events_future_ts")),
        "check_name", "n_violations")
    eScalar
      .unionByName(check("events_id_duplicates",
        e.groupBy("event_id").count().filter(col("count") > 1)))
      .unionByName(check("orders_fk_customer",
        o.join(broadcast(c.select("c_custkey")), col("o_custkey") === col("c_custkey"), "left_anti")))
      .unionByName(check("lineitem_fk_orders",
        l.join(o.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")))
      .unionByName(check("lineitem_fk_part",
        l.join(broadcast(Tables.load(s, dir, "part").select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_anti")))
      .unionByName(check("lineitem_fk_supplier",
        l.join(broadcast(Tables.load(s, dir, "supplier").select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")))
      .unionByName(check("lineitem_discount_range",
        l.filter(col("l_discount") < 0 || col("l_discount") > 1)))
      .orderBy("check_name")
  }

  val q16Sql: String =
    """SELECT * FROM (
      |  SELECT 'events_value_range' AS check_name,
      |    COUNT(*) AS n_violations FROM events WHERE value < 0 OR value > 1e6
      |  UNION ALL
      |  SELECT 'events_id_duplicates', COUNT(*) FROM
      |    (SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) > 1) t
      |  UNION ALL
      |  SELECT 'events_future_ts', COUNT(*) FROM events
      |    WHERE ts > TIMESTAMP '2026-01-01'
      |  UNION ALL
      |  SELECT 'orders_fk_customer', COUNT(*) FROM orders
      |    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders', COUNT(*) FROM lineitem
      |    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_fk_part', COUNT(*) FROM lineitem
      |    WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
      |  UNION ALL
      |  SELECT 'lineitem_fk_supplier', COUNT(*) FROM lineitem
      |    WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
      |  UNION ALL
      |  SELECT 'lineitem_discount_range', COUNT(*) FROM lineitem
      |    WHERE l_discount < 0 OR l_discount > 1) t
      |ORDER BY check_name""".stripMargin

  /** q17: timestamp normalization + JSON property extraction
    * (reference: bio_etl_utils.py:135-155 normalize_timestamp;
    * oura_normalizer.py:151-223 JSON record flattening). Epoch seconds,
    * hour bucket, day-of-week, and a typed field pulled out of the raw
    * JSON props payload — all codegen'd builtins, no UDF.
    */
  def q17JsonNormalize(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour_bucket"),
        dayofweek(col("ts")).as("dow"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
        col("value"))
      .orderBy("event_id")

  val q17Sql: String =
    """SELECT event_id,
      |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
      |  STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
      |  dayofweek(ts) + 1 AS dow,
      |  CAST(json_extract(props, '$.k') AS INT) AS prop_k,
      |  value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** q18: observation-record construction → canonical JSON string
    * (reference: glue/fhir_observation_builder.py, bio_etl_utils.py:379-409
    * — rows become FHIR Observation resources). Numeric values are encoded
    * as scaled ints (centi-units): cross-engine double→string JSON
    * rendering is not canonical, scaled ints are.
    */
  def q18StructJson(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        col("event_id"),
        to_json(struct(
          lit("Observation").as("resourceType"),
          concat(lit("obs-"), col("event_id")).as("id"),
          col("event_type").as("code"),
          concat(lit("user/"), col("user_id")).as("subject"),
          dayCol.as("effective"),
          floor(col("value") * 100 + lit(0.5)).cast("int").as("value_centi"),
          lit("score").as("unit"))).as("fhir_json"))
      .orderBy("event_id")

  val q18Sql: String =
    """SELECT event_id,
      |  json_object(
      |    'resourceType', 'Observation',
      |    'id', 'obs-' || event_id,
      |    'code', event_type,
      |    'subject', 'user/' || user_id,
      |    'effective', STRFTIME(ts, '%Y-%m-%d'),
      |    'value_centi', CAST(FLOOR(value * 100 + 0.5) AS INT),
      |    'unit', 'score')::VARCHAR AS fhir_json
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** q82: FHIR R4 Bundle composition — the bundle layer above q18's
    * per-metric Observations (reference: insights_engine/fhir/
    * bundle_builder.py:98-216 — name-based resource ids, one Observation
    * per positive (metric, day) value, a Patient resource as the first
    * entry, and a `collection` Bundle wrapper carrying total + entries).
    *
    * Engine form: one bundle per entity (the reference's single
    * PATIENT_REFERENCE generalized per §3), entries deterministically
    * ordered by their resource id so the bundle TEXT itself is the
    * oracle contract. Resource ids are name-based like the reference's
    * uuid5, but derived from sha-256 (uuid5's SHA-1 is not available as
    * portable arithmetic in both engines; the id is formatted to the
    * same 8-4-4-4-12 shape and is equally deterministic). The Bundle
    * `id`/`timestamp` are the reference's only non-reproducible fields
    * (uuid4 + utcnow, bundle_builder.py:211-213) — here the id is keyed
    * to the entity and the timestamp is omitted, so every run of every
    * engine emits byte-identical bundles.
    *
    * Scale: one partial-aggregated pass for the daily metrics, a JSON
    * projection, one groupBy(user) string aggregation — entries per
    * entity are bounded (metrics × days), never corpus-wide.
    */
  def q82FhirBundle(s: SparkSession, dir: String): DataFrame = {
    def uuidish(key: Column): Column = {
      val h = sha2(key, 256)
      concat(
        substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
        substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
        substring(h, 21, 12))
    }
    val daily = Alerts.dailyMetrics(graft.Tables.load(s, dir, "events"))
      .filter(col("observed") > 0)
    val uid = col("user_id").cast("string")
    val obs = daily
      .withColumn("fid", uuidish(concat_ws(":", lit("graft"), col("metric"), col("day"), uid)))
      .withColumn("obs_json", to_json(struct(
        lit("Observation").as("resourceType"),
        col("fid").as("id"),
        lit("final").as("status"),
        col("metric").as("code"),
        concat(lit("Patient/user-"), uid).as("subject"),
        concat(col("day"), lit("T00:00:00Z")).as("effectiveDateTime"),
        floor(col("observed") * 100 + lit(0.5)).cast("int").as("value_centi"),
        lit("score").as("unit"))))
      .withColumn("entry_json", concat(
        lit("{\"fullUrl\":\"urn:uuid:"), col("fid"),
        lit("\",\"resource\":"), col("obs_json"), lit("}")))
    val g = obs.groupBy("user_id").agg(
      count(lit(1)).as("n_obs"),
      array_join(array_sort(collect_list(col("entry_json"))), ",").as("entries"))
    g.select(
        col("user_id"),
        (col("n_obs") + 1).as("total"),
        concat(
          lit("{\"resourceType\":\"Bundle\",\"id\":\"bundle-user-"), uid,
          lit("\",\"type\":\"collection\",\"total\":"), (col("n_obs") + 1).cast("string"),
          lit(",\"entry\":[{\"fullUrl\":\"urn:uuid:"),
          uuidish(concat(lit("graft:patient:user-"), uid)),
          lit("\",\"resource\":{\"resourceType\":\"Patient\",\"id\":\"user-"), uid,
          lit("\",\"active\":true,\"name\":[{\"text\":\"Graft User "), uid,
          lit("\"}]}},"), col("entries"), lit("]}")).as("bundle_json"))
      .orderBy("user_id")
  }

  val q82Sql: String = {
    def uuidish(e: String) =
      s"""substr(sha256($e), 1, 8) || '-' || substr(sha256($e), 9, 4) || '-' ||
         |    substr(sha256($e), 13, 4) || '-' || substr(sha256($e), 17, 4) || '-' ||
         |    substr(sha256($e), 21, 12)""".stripMargin
    s"""WITH daily AS (
       |  SELECT user_id, event_type AS metric, STRFTIME(ts, '%Y-%m-%d') AS day,
       |    ${graft.Num.sqlAvg("value")} AS observed
       |  FROM events GROUP BY 1, 2, 3),
       |obs AS (
       |  SELECT user_id,
       |    ${uuidish("'graft:' || metric || ':' || day || ':' || CAST(user_id AS VARCHAR)")} AS fid,
       |    metric, day, observed
       |  FROM daily WHERE observed > 0),
       |entries AS (
       |  SELECT user_id,
       |    '{"fullUrl":"urn:uuid:' || fid || '","resource":' ||
       |    json_object(
       |      'resourceType', 'Observation',
       |      'id', fid,
       |      'status', 'final',
       |      'code', metric,
       |      'subject', 'Patient/user-' || CAST(user_id AS VARCHAR),
       |      'effectiveDateTime', day || 'T00:00:00Z',
       |      'value_centi', CAST(FLOOR(observed * 100 + 0.5) AS INT),
       |      'unit', 'score')::VARCHAR || '}' AS entry_json
       |  FROM obs),
       |g AS (
       |  SELECT user_id, COUNT(*) AS n_obs,
       |    STRING_AGG(entry_json, ',' ORDER BY entry_json) AS entries
       |  FROM entries GROUP BY 1)
       |SELECT user_id, n_obs + 1 AS total,
       |  '{"resourceType":"Bundle","id":"bundle-user-' || CAST(user_id AS VARCHAR) ||
       |  '","type":"collection","total":' || CAST(n_obs + 1 AS VARCHAR) ||
       |  ',"entry":[{"fullUrl":"urn:uuid:' ||
       |  ${uuidish("'graft:patient:user-' || CAST(user_id AS VARCHAR)")} ||
       |  '","resource":{"resourceType":"Patient","id":"user-' || CAST(user_id AS VARCHAR) ||
       |  '","active":true,"name":[{"text":"Graft User ' || CAST(user_id AS VARCHAR) ||
       |  '"}]}},' || entries || ']}' AS bundle_json
       |FROM g
       |ORDER BY user_id""".stripMargin
  }

  /** q19: tumbling 1-hour window aggregation — batch form of the streaming
    * hourly rollup (reference: lambda/health_alerts/handler.py hourly
    * aggregation; the true streaming path is graft.streaming.EventStreams).
    * Spark's window() aligns to the epoch for whole-hour slides, so the
    * bucket equals date_trunc('hour') and is oracle-comparable.
    */
  def q19TumblingWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Num.sumD(col("value"), 2).as("total_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"), col("n_users"))
      .orderBy("hour_start", "event_type")

  val q19Sql: String =
    s"""SELECT STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_start,
       |  event_type, COUNT(*) AS n_events,
       |  ${Num.sqlSum("value", 2)} AS total_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin
}
