package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and split assignment for training-data curation: the
  * operations that turn a deduplicated corpus into train/eval sets — a
  * deterministic hash split, stratified per-group caps, weighted source
  * mixing, and fixed-budget sequence packing.
  *
  * Everything here is hash-deterministic (md5 of a salted key), never
  * `rand()`: reruns, retried tasks, and the DuckDB oracle all see the
  * same assignment, and membership is reproducible from the key alone —
  * the property a 100 TB pipeline needs so that a re-crawl or a late
  * partition doesn't reshuffle the split. All four ops are scan-shaped
  * (no joins; the only shuffles are the per-stratum window and the
  * harness-imposed output ORDER BY).
  *
  * Reference behavior mirrored: the train/holdout split and cohort
  * sampling in the reference's model layer (readiness_predictor/train.py
  * train_test_split, insights cohort sampling) re-expressed as
  * deterministic engine-side operators.
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Value of one lowercase-hex character as a codegen'd expression. */
  private def hexVal(c: Column): Column =
    when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48)

  /** Deterministic bucket in [0, 100): the first 4 hex chars of
    * md5(salt:key) as an integer, mod 100. Pure column arithmetic (no
    * UDF) and portable — the oracle rebuilds the identical value from
    * DuckDB's md5, so split membership agrees bit-for-bit across engines.
    */
  def bucket100(salt: String, key: Column): Column = {
    val h = md5(concat(lit(salt + ":"), key.cast("string")))
    val v = hexVal(substring(h, 1, 1)) * 4096 +
      hexVal(substring(h, 2, 1)) * 256 +
      hexVal(substring(h, 3, 1)) * 16 +
      hexVal(substring(h, 4, 1))
    v % 100
  }

  /** Oracle-SQL fragment mirroring [[bucket100]]; reads the salted md5
    * a prior CTE must expose as `h` (see [[sqlSaltedMd5]]). */
  def sqlBucket100: String = {
    def hx(i: Int) = {
      val c = s"ascii(substr(h, $i, 1))"
      s"(CASE WHEN $c >= 97 THEN $c - 87 ELSE $c - 48 END)"
    }
    s"((${hx(1)} * 4096 + ${hx(2)} * 256 + ${hx(3)} * 16 + ${hx(4)}) % 100)"
  }

  /** SQL for the salted md5 the bucket fragments read (`h`). */
  def sqlSaltedMd5(salt: String, keyExpr: String): String =
    s"md5('$salt:' || CAST($keyExpr AS VARCHAR))"

  /** q47: deterministic train/validation/test split — 80/10/10 by hash
    * bucket of doc_id. Membership depends only on the id, so adding data
    * never moves an existing document between splits (the stability
    * property `rand()`-based splits lack).
    */
  def q47SplitAssign(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("bucket", bucket100("split", col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("validation"))
          .otherwise(lit("test")))
      .select("doc_id", "lang", "source", "bucket", "split")
      .orderBy("doc_id")

  val q47Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, source, ${sqlSaltedMd5("split", "doc_id")} AS h
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, lang, source, ${sqlBucket100} AS bucket FROM t)
       |SELECT doc_id, lang, source, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM b
       |ORDER BY doc_id""".stripMargin

  /** q48: stratified capped sample — at most `cap` documents per
    * language, chosen by hash order (md5 of the id), so the sample is
    * uniform-at-random yet fully reproducible. The rank filter compiles
    * to WindowGroupLimit: each shuffle partition keeps only its local
    * top-cap before the exchange, so per-stratum state is O(cap), not
    * O(stratum size) — the property that makes a per-language cap
    * survive a 100 TB English-heavy crawl.
    */
  def q48StratifiedSample(s: SparkSession, dir: String, cap: Int = 40): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("hkey"), col("doc_id"))
    docs(s, dir)
      .withColumn("hkey", md5(concat(lit("strat:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select("doc_id", "lang", "source", "rk")
      .orderBy("lang", "rk")
  }

  val q48Sql: String =
    """WITH r AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, lang, source, rk FROM r
      |WHERE rk <= 40
      |ORDER BY lang, rk""".stripMargin

  /** Per-source target sampling rate (percent) for q49: a three-tier
    * mixing policy keyed on the numeric source suffix — keep all of
    * every third source ("curated"), half of the next tier, a quarter of
    * the rest ("bulk web"). Expressed as a column so membership is
    * engine-side, not a driver-side lookup table.
    */
  private def ratePct(sourceNum: Column): Column =
    when(sourceNum % 3 === 0, lit(100))
      .when(sourceNum % 3 === 1, lit(50))
      .otherwise(lit(25))

  /** q49: weighted source mixing — downsample each source to its target
    * rate by hash bucket, report per-source totals, kept counts, and the
    * realized rate against the target. One scan, map-side partial agg;
    * the decision is per-row arithmetic, so it runs at scan speed over
    * any number of sources.
    */
  def q49SourceMixing(s: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    docs(s, dir)
      .withColumn("rate_pct", ratePct(srcNum))
      .withColumn("kept",
        (bucket100("mix", col("doc_id")) < col("rate_pct")).cast("int"))
      .groupBy(col("source"), col("rate_pct"))
      .agg(
        count(lit(1)).as("total_docs"),
        sum(col("kept")).as("kept_docs"),
        Num.sumD(when(col("kept") === 1, col("n_chars").cast("double"))
          .otherwise(lit(0.0))).as("kept_chars"))
      .withColumn("realized_pct",
        Num.roundD(col("kept_docs").cast("double") * 100.0 / col("total_docs")))
      .select("source", "rate_pct", "total_docs", "kept_docs", "kept_chars",
        "realized_pct")
      .orderBy("source")
  }

  val q49Sql: String =
    s"""WITH t AS (
       |  SELECT source, n_chars,
       |    CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0 THEN 100
       |         WHEN CAST(substr(source, 4) AS INT) % 3 = 1 THEN 50
       |         ELSE 25 END AS rate_pct,
       |    ${sqlSaltedMd5("mix", "doc_id")} AS h
       |  FROM documents),
       |k AS (
       |  SELECT source, rate_pct, n_chars,
       |    CAST(${sqlBucket100} < rate_pct AS INT) AS kept
       |  FROM t)
       |SELECT source, rate_pct, COUNT(*) AS total_docs,
       |  CAST(SUM(kept) AS BIGINT) AS kept_docs,
       |  ${Num.sqlSum("CASE WHEN kept = 1 THEN CAST(n_chars AS DOUBLE) ELSE 0.0 END")} AS kept_chars,
       |  ${Num.sqlRoundD("CAST(SUM(kept) AS DOUBLE) * 100.0 / COUNT(*)")} AS realized_pct
       |FROM k
       |GROUP BY source, rate_pct
       |ORDER BY source""".stripMargin

  /** q50: fixed-budget sequence packing — concat-and-chunk: documents
    * are laid end-to-end in a deterministic order and cut into
    * `budget`-token context windows; each document reports the pack its
    * first token lands in, its offset there, and whether it straddles a
    * boundary (straddlers truncate or continue at training time).
    *
    * The running total is per (lang, shard), NOT per lang: packing needs
    * locality, not a global order, so the stream is sharded 32 ways by
    * id hash and packed independently per shard. That turns the skewed
    * single-language window (all of English through one reducer) into 32
    * balanced ones — the difference between a day and an hour on a real
    * corpus — at the cost of at most one partially-filled final pack per
    * shard.
    */
  def q50PackSequences(s: SparkSession, dir: String, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs(s, dir)
      .withColumn("shard", (col("doc_id") % 32).cast("int"))
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tok"))
      .withColumn("pack_id", expr(s"tok_start div $budget"))
      .withColumn("pack_offset", col("tok_start") % budget)
      .withColumn("straddles",
        (expr(s"(tok_end - 1) div $budget") > col("pack_id")).cast("int"))
      .select("doc_id", "lang", "shard", "n_tok", "pack_id", "pack_offset",
        "straddles")
      .orderBy("doc_id")
  }

  val q50Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, CAST(doc_id % 32 AS INT) AS shard,
      |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, lang, shard, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id) AS tok_end
      |  FROM t)
      |SELECT doc_id, lang, shard, n_tok,
      |  CAST((tok_end - n_tok) // 512 AS BIGINT) AS pack_id,
      |  CAST((tok_end - n_tok) % 512 AS BIGINT) AS pack_offset,
      |  CAST((tok_end - 1) // 512 > (tok_end - n_tok) // 512 AS INT) AS straddles
      |FROM c
      |ORDER BY doc_id""".stripMargin
}
