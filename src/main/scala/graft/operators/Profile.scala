package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling: per-column statistics (row/non-null/distinct counts,
  * numeric and string min/max, null ratio) in a single pass — the
  * `ANALYZE TABLE`-style summary every warehouse keeps and the first
  * query anyone runs against an unknown 100 TB table.
  */
object Profile {

  private val NumericCols = Seq("event_id", "ts_us", "user_id", "value")
  private val StringCols = Seq("event_type", "props")

  /** q55: exact column profile of the events table — one single-distinct
    * aggregate branch per column, unioned. Numeric and string extrema
    * stay in their own typed columns — stringifying doubles would hit
    * engine-specific formatting, the one thing a cross-engine oracle
    * cannot absorb.
    *
    * Why per-column branches and not one aggregate with d
    * `count(distinct)`s: multiple distinct aggregates plan through
    * Expand, which multiplies every input row d× (measured 3.2 s at
    * sf0.1 — the suite's 2nd-slowest query). A branch with exactly ONE
    * distinct aggregate plans as a plain two-stage distinct aggregate
    * (no Expand), its scan prunes to just that column, and the union's
    * branches schedule concurrently inside one job; the per-branch shape
    * is exactly how ANALYZE TABLE computes per-column stats at fleet
    * scale. [[profileApprox]] remains
    * the one-pass HLL variant to run at 100 TB (ProfileSpec bounds its
    * error against this one).
    *
    * Extrema are pass-through values, never arithmetic: the same stored
    * double/int surfaces from both engines bit-identically, and rounding
    * would overflow (floor() returns LONG; micros ×1e4 exceeds it).
    * Plain double cast — exact below 2^53.
    */
  def q55ColumnProfile(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val perCol = (NumericCols.map((_, true)) ++ StringCols.map((_, false)))
      .map { case (c, isNum) =>
        e.agg(
            count(lit(1)).as("n_rows"),
            count(col(c)).as("n_non_null"),
            countDistinct(col(c)).as("n_distinct"),
            (if (isNum) min(col(c)).cast("double")
             else lit(null).cast("double")).as("min_num"),
            (if (isNum) max(col(c)).cast("double")
             else lit(null).cast("double")).as("max_num"),
            (if (isNum) lit(null).cast("string") else min(col(c))).as("min_str"),
            (if (isNum) lit(null).cast("string") else max(col(c))).as("max_str"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_non_null"),
            col("n_distinct"), col("min_num"), col("max_num"),
            col("min_str"), col("max_str"))
      }
    perCol.reduce(_.unionByName(_))
      .withColumn("null_ratio",
        Num.roundD((col("n_rows") - col("n_non_null")).cast("double") / col("n_rows")))
      .select("column_name", "n_rows", "n_non_null", "n_distinct",
        "min_num", "max_num", "min_str", "max_str", "null_ratio")
      .orderBy("column_name")
  }

  val q55Sql: String = {
    def row(c: String, isNum: Boolean): String = {
      val mnn = if (isNum) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mxn = if (isNum) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mns = if (isNum) "CAST(NULL AS VARCHAR)" else s"MIN($c)"
      val mxs = if (isNum) "CAST(NULL AS VARCHAR)" else s"MAX($c)"
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT($c) AS n_non_null, COUNT(DISTINCT $c) AS n_distinct,
         |  $mnn AS min_num, $mxn AS max_num, $mns AS min_str, $mxs AS max_str,
         |  ${Num.sqlRoundD(s"CAST(COUNT(*) - COUNT($c) AS DOUBLE) / COUNT(*)")} AS null_ratio
         |FROM e""".stripMargin
    }
    val rows = (NumericCols.map(row(_, isNum = true)) ++
      StringCols.map(row(_, isNum = false))).mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events)
       |$rows
       |ORDER BY column_name""".stripMargin
  }

  /** q70: distribution-drift monitor — chi-square distance between the
    * early and late half of the month, per event type, over fixed-width
    * value buckets. The batch-over-batch drift check a production
    * pipeline runs before accepting new data (the PSI shape, with a
    * rational statistic: Σ (p−q)²/(p+q) has no logarithm, so both
    * engines compute it bit-identically — ln's last-ulp differences
    * would break the oracle for classic PSI).
    *
    * Scale shape: ONE scan → groupBy (type, bucket) with conditional
    * partial aggregates; totals are a 5-row broadcast; the final
    * per-type reduce sums decimal-cast terms (order-independent). State
    * is bounded by types × buckets regardless of row count.
    */
  def q70DriftChi2(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .withColumn("half",
        when(dayofmonth(col("ts")) <= 15, "early").otherwise("late"))
      .withColumn("bucket",
        least(lit(19L), floor(col("value") / 25.0)).cast("int"))
    val counts = e.groupBy("event_type", "bucket")
      .agg(
        sum((col("half") === "early").cast("long")).as("c_early"),
        sum((col("half") === "late").cast("long")).as("c_late"))
    val totals = e.groupBy("event_type")
      .agg(
        sum((col("half") === "early").cast("long")).as("n_early"),
        sum((col("half") === "late").cast("long")).as("n_late"))
    val p = col("c_early").cast("double") / col("n_early")
    val q = col("c_late").cast("double") / col("n_late")
    val term = (p - q) * (p - q) / (p + q)
    counts.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("n_early"), col("n_late"), term.as("term"))
      .groupBy("event_type", "n_early", "n_late")
      .agg(count(lit(1)).as("n_buckets"), Num.sumD(col("term"), 6).as("chi2_distance"))
      .withColumn("drifted", (col("chi2_distance") > 0.01).cast("int"))
      .select("event_type", "n_early", "n_late", "n_buckets", "chi2_distance", "drifted")
      .orderBy("event_type")
  }

  val q70Sql: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    CASE WHEN date_part('day', ts) <= 15 THEN 'early' ELSE 'late' END AS half,
       |    CAST(LEAST(19, FLOOR(value / 25.0)) AS INT) AS bucket
       |  FROM events),
       |counts AS (
       |  SELECT event_type, bucket,
       |    CAST(SUM(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT) AS c_early,
       |    CAST(SUM(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT) AS c_late
       |  FROM e GROUP BY 1, 2),
       |totals AS (
       |  SELECT event_type,
       |    CAST(SUM(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
       |    CAST(SUM(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT) AS n_late
       |  FROM e GROUP BY 1),
       |pq AS (
       |  SELECT c.event_type, t.n_early, t.n_late,
       |    CAST(c_early AS DOUBLE) / n_early AS p,
       |    CAST(c_late AS DOUBLE) / n_late AS q
       |  FROM counts c JOIN totals t ON c.event_type = t.event_type),
       |terms AS (
       |  SELECT event_type, n_early, n_late,
       |    (p - q) * (p - q) / (p + q) AS term
       |  FROM pq)
       |SELECT event_type, n_early, n_late, COUNT(*) AS n_buckets,
       |  ${Num.sqlSum("term", 6)} AS chi2_distance,
       |  CAST(${Num.sqlSum("term", 6)} > 0.01 AS INT) AS drifted
       |FROM terms
       |GROUP BY event_type, n_early, n_late
       |ORDER BY event_type""".stripMargin

  /** The 100 TB profile: identical shape, `approx_count_distinct` (HLL,
    * one pass, no Expand blowup) in place of exact distinct counts.
    * Engine-specific sketch results by design → no oracle; ProfileSpec
    * asserts each estimate within HLL's relative-error envelope of q55's
    * exact counts.
    */
  def profileApprox(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val cols = NumericCols ++ StringCols
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        approx_count_distinct(col(c), 0.02).as(s"nd_$c"))
    }
    val one = e.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = s"stack(${cols.length}, " + cols.map(c =>
      s"'$c', nn_$c, nd_$c").mkString(", ") +
      ") AS (column_name, n_non_null, n_distinct_approx)"
    one.select(col("n_rows"), expr(stackExpr))
      .select("column_name", "n_rows", "n_non_null", "n_distinct_approx")
      .orderBy("column_name")
  }

  // --------------------------------------------------------------- q132

  /** q132: population-stability-index (PSI) report — per source, the
    * shift of the quality-score distribution against the corpus-wide
    * distribution, with the standard PSI rubric (≥0.25 shift, ≥0.1
    * watch) as the flag a data-ops rotation actually reads. q70's χ²
    * drift monitor compares a table against ITS OWN history; PSI
    * compares each slice against the whole, which is how ingest
    * monitoring spots the one crawler whose content quietly degraded.
    *
    * Binning is FIXED-WIDTH over the score's [0,1] range — a row-local
    * expression, where the quantile-bin alternative would demand a
    * global NTILE (single-partition window over the corpus: the exact
    * shape this codebase bans). Shares are clamped at 1e-4 so empty
    * bins contribute a finite penalty instead of ±∞, and both shares
    * and the log-ratio round before combining (the q114 discipline:
    * identical doubles into LN on both engines, 6 dp out of it).
    *
    * Scale shape: ONE corpus-sized partial-aggregated groupBy (the
    * (source, bin) counts — a persisted sources × 10 frame); the
    * per-source totals, global bin counts, and grand total all roll up
    * from that tiny frame, so the scoring scan runs exactly once.
    */
  def q132SourcePsi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val srcBin = TextOps.stats(Tables.load(s, dir, "documents"))
      .select(col("source"),
        least(floor(col("quality_score") * 10).cast("int"), lit(9)).as("bin"))
      .groupBy("source", "bin").agg(count(lit(1)).as("cnt"))
      .persist()
    srcBin.count() // materialize: three rollups below reuse it
    val srcTot = srcBin.groupBy("source").agg(sum("cnt").as("n_docs"))
    val gBin = srcBin.groupBy("bin").agg(sum("cnt").as("gcnt"))
    val gTot = srcBin.agg(sum("cnt").as("g_total"))
    val bins = (0 to 9).toDF("bin")
    srcTot.crossJoin(broadcast(bins))
      .join(srcBin, Seq("source", "bin"), "left")
      .join(broadcast(gBin), Seq("bin"), "left")
      .crossJoin(broadcast(gTot))
      .withColumn("p", greatest(Num.roundD(
        coalesce(col("cnt"), lit(0L)).cast("double") / col("n_docs"), 6),
        lit(1e-4)))
      .withColumn("g", greatest(Num.roundD(
        coalesce(col("gcnt"), lit(0L)).cast("double") / col("g_total"), 6),
        lit(1e-4)))
      .withColumn("term", Num.roundD(
        (col("p") - col("g")) * Num.roundD(log(col("p") / col("g")), 6), 6))
      .groupBy("source", "n_docs")
      .agg(Num.roundD(Num.exactSum(col("term")).cast("double"), 6).as("psi_r"))
      .withColumn("drift_flag",
        when(col("psi_r") >= 0.25, "shift")
          .when(col("psi_r") >= 0.1, "watch")
          .otherwise("ok"))
      .select("source", "n_docs", "psi_r", "drift_flag")
      .orderBy("source")
  }

  val q132Sql: String = {
    val quality = Num.sqlRoundD(
      "GREATEST(0.0, LEAST(1.0, 0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) " +
        "+ 0.3 * (1.0 - stopword_ratio) + 0.3 * type_token_ratio))")
    s"""WITH t AS (
       |  SELECT source, string_split(lower(trim(text)), ' ') AS w FROM documents),
       |st AS (
       |  SELECT source,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    ${Num.sqlRoundD("CAST(len(list_filter(w, x -> x IN ('a', 'the'))) AS DOUBLE) / len(w)")} AS stopword_ratio,
       |    ${Num.sqlRoundD("CAST(len(list_distinct(w)) AS DOUBLE) / len(w)")} AS type_token_ratio
       |  FROM t),
       |b AS (
       |  SELECT source, LEAST(CAST(FLOOR($quality * 10) AS INT), 9) AS bin
       |  FROM st),
       |sb AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY 1, 2),
       |stt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM b GROUP BY 1),
       |gb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS gcnt FROM b GROUP BY 1),
       |gt AS (SELECT CAST(COUNT(*) AS BIGINT) AS g_total FROM b),
       |grid AS (
       |  SELECT source, n_docs, CAST(unnest(range(10)) AS INT) AS bin FROM stt),
       |j AS (
       |  SELECT grid.source, grid.n_docs,
       |    GREATEST(${Num.sqlRoundD("CAST(COALESCE(cnt, 0) AS DOUBLE) / n_docs", 6)}, 0.0001) AS p,
       |    GREATEST(${Num.sqlRoundD("CAST(COALESCE(gcnt, 0) AS DOUBLE) / g_total", 6)}, 0.0001) AS g
       |  FROM grid LEFT JOIN sb USING (source, bin)
       |  LEFT JOIN gb USING (bin), gt),
       |tm AS (
       |  SELECT source, n_docs,
       |    ${Num.sqlRoundD(s"(p - g) * ${Num.sqlRoundD("LN(p / g)", 6)}", 6)} AS term
       |  FROM j),
       |ps AS (
       |  SELECT source, n_docs,
       |    ${Num.sqlRoundD("CAST(SUM(CAST(term AS DECIMAL(25,6))) AS DOUBLE)", 6)} AS psi_r
       |  FROM tm GROUP BY source, n_docs)
       |SELECT source, n_docs, psi_r,
       |  CASE WHEN psi_r >= 0.25 THEN 'shift'
       |       WHEN psi_r >= 0.1 THEN 'watch'
       |       ELSE 'ok' END AS drift_flag
       |FROM ps
       |ORDER BY source""".stripMargin
  }
}
