package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over the documents corpus — the classic IR
  * primitive behind keyword extraction, sparse retrieval, and quality
  * heuristics.
  */
object TextRank {

  /** q63: top-3 TF-IDF terms per document. One token explode feeds both
    * the per-(doc, term) TF aggregate and the per-term DF aggregate; the
    * TF↔IDF join shuffles on the term key (the vocabulary can be as
    * large as the corpus — broadcasting it is the mistake; an equi-join
    * on term is one bounded exchange). The per-doc top-k is a
    * WindowGroupLimit rank, so only 3 rows per document survive to the
    * final exchange. Ties (equal scores within a doc) break on the term
    * string so both engines pick identical rows.
    */
  def q63TfidfTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // corpus size rides along as a broadcast one-row aggregate — no
    // eager driver-side count, no extra scan per execution
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val terms = docs
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        Num.roundD(col("tf") * log(col("n") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "term", "tf", "df", "tfidf")
      .orderBy("doc_id", "rk")
  }

  val q63Sql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
       |  FROM documents),
       |t AS (SELECT doc_id, term FROM terms WHERE len(term) > 0),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df
       |       FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    ${Num.sqlRoundD("tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)", 6)} AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, term) AS rk
       |  FROM scored)
       |SELECT doc_id, rk, term, tf, df, tfidf FROM r WHERE rk <= 3
       |ORDER BY doc_id, rk""".stripMargin

  /** q64: conversion funnel — per user, the ordered view → click →
    * purchase progression: a stage counts only if its first occurrence
    * follows the previous stage's. One conditional aggregate per user
    * (no joins, no window pass): each stage's timestamp is a MIN over a
    * filtered column, and the ordering constraint composes on top. The
    * funnel summary is the stage-by-stage user count with drop-off.
    */
  def q64Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .withColumn("ts_us", expr("unix_micros(ts)"))
    def firstOf(t: String) = min(when(col("event_type") === t, col("ts_us")))
    val perUser = e.groupBy("user_id")
      .agg(firstOf("view").as("first_view"),
        firstOf("click").as("first_click"),
        firstOf("purchase").as("first_purchase"))
      .withColumn("reached_view", col("first_view").isNotNull.cast("int"))
      .withColumn("reached_click",
        (col("first_view").isNotNull && col("first_click") > col("first_view"))
          .cast("int"))
      .withColumn("reached_purchase",
        (col("first_view").isNotNull && col("first_click") > col("first_view") &&
          col("first_purchase") > col("first_click")).cast("int"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        sum("reached_view").as("stage_view"),
        sum("reached_click").as("stage_view_click"),
        sum("reached_purchase").as("stage_view_click_purchase"))
      .withColumn("conv_view_to_click",
        Num.roundD(col("stage_view_click").cast("double") / col("stage_view")))
      .withColumn("conv_click_to_purchase",
        Num.roundD(col("stage_view_click_purchase").cast("double") /
          col("stage_view_click")))
  }

  val q64Sql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |u AS (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS first_view,
       |    MIN(CASE WHEN event_type = 'click' THEN ts_us END) AS first_click,
       |    MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS first_purchase
       |  FROM e GROUP BY user_id),
       |s AS (
       |  SELECT
       |    CAST(first_view IS NOT NULL AS INT) AS rv,
       |    CAST(first_view IS NOT NULL AND first_click > first_view AS INT) AS rc,
       |    CAST(first_view IS NOT NULL AND first_click > first_view
       |      AND first_purchase > first_click AS INT) AS rp
       |  FROM u)
       |SELECT COUNT(*) AS n_users,
       |  CAST(SUM(rv) AS BIGINT) AS stage_view,
       |  CAST(SUM(rc) AS BIGINT) AS stage_view_click,
       |  CAST(SUM(rp) AS BIGINT) AS stage_view_click_purchase,
       |  ${Num.sqlRoundD("CAST(SUM(rc) AS DOUBLE) / SUM(rv)")} AS conv_view_to_click,
       |  ${Num.sqlRoundD("CAST(SUM(rp) AS DOUBLE) / SUM(rc)")} AS conv_click_to_purchase
       |FROM s""".stripMargin
}
