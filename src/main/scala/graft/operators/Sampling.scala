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

  /** Deterministic 24-bit hash in [0, 2²⁴): the first 6 hex chars of
    * md5(salt:key) as an integer — the fine-grained threshold
    * counterpart of [[bucket100]] (a token-budget draw needs better
    * than 1% rate granularity). Same portability contract: the oracle
    * rebuilds the identical value from DuckDB's md5.
    */
  def hex24(salt: String, key: Column): Column = {
    val h = md5(concat(lit(salt + ":"), key.cast("string")))
    (0 until 6).map(i => hexVal(substring(h, i + 1, 1)) * (1 << (4 * (5 - i))))
      .reduce(_ + _).cast("long")
  }

  /** Oracle-SQL fragment mirroring [[hex24]]; reads the salted md5 a
    * prior CTE must expose as `h`. */
  def sqlHex24: String = {
    def hx(i: Int) = {
      val c = s"ascii(substr(h, $i, 1))"
      s"(CASE WHEN $c >= 97 THEN $c - 87 ELSE $c - 48 END)"
    }
    (1 to 6).map(i => s"${hx(i)} * ${1L << (4 * (6 - i))}").mkString("(", " + ", ")")
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

  /** q100: UniMax epoch-capped language allocation — the data-mixing
    * complement to q49: there the per-source rates are GIVEN; here the
    * per-language budget is COMPUTED from the corpus by the published
    * recipe (Chung et al., ICLR 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining"): spread the token budget as uniformly as possible
    * across languages, but never draw more than `epochCap` epochs of
    * any one language — the fix for temperature sampling's pathology
    * where low-resource languages get repeated tens of epochs.
    *
    * UniMax's greedy per-language loop is sequential; its fixpoint is
    * the classic water-filling allocation, which has a closed form
    * under a sort — so the operator computes the SAME allocation with
    * window functions instead of a driver loop. With per-language caps
    * c₁ ≤ … ≤ cₙ (cap = epochCap × available tokens) and prefix sums
    * Pₖ, language k is budget-capped iff its cap fits even when every
    * later language gets at least as much: cₖ·(n−k+1) + Pₖ₋₁ ≤ B (an
    * all-integer test — cross-engine exact). Capped languages take
    * their cap; the rest split the remainder evenly at the water level
    * λ = (B − P_capped)/(n − K). B < Σcaps guarantees an uncapped
    * language exists, so the level's divisor is never zero.
    *
    * The synthetic corpus's languages are near-BALANCED (a 2.5× spread,
    * nothing like the 10⁴× of a real multilingual crawl), so a
    * multi-epoch cap never binds at any budget below supply; the query
    * pins the regime where the waterfall has something to decide —
    * B = 4/5 of the total token supply against a 1-epoch cap — which
    * at every sf yields the mixed outcome worth testing: low-resource
    * languages capped at their full single epoch, the rest drawn down
    * to a common water level below their caps.
    *
    * Plan shape at 100 TB: ONE partial-aggregated groupBy(lang) is the
    * only corpus-sized shuffle; the waterfall windows run over the
    * languages frame — hundreds of rows at worst, a deliberate
    * single-partition window (same pattern as every per-lang rollup
    * here). Output is the allocation table a sampler consumes: tokens,
    * epochs, and the normalized mixture weight per language.
    */
  def q100UnimaxMixture(s: SparkSession, dir: String, epochCap: Int = 1): DataFrame =
    unimaxAlloc(s, dir, epochCap)
      .withColumn("epochs_used",
        Num.roundD(col("alloc_tokens") / col("avail_tokens")))
      .withColumn("weight", Num.roundD(col("alloc_tokens") / col("budget")))
      .select("lang", "avail_tokens", "cap_tokens", "is_capped",
        "alloc_tokens", "epochs_used", "weight")
      .orderBy("lang")

  /** The UniMax waterfall shared by q100 (the allocation report) and
    * q103 (the per-document draw): per-language avail/cap/is_capped/
    * alloc_tokens plus the budget — see [[q100UnimaxMixture]] for the
    * recipe and the closed form.
    */
  private[graft] def unimaxAlloc(s: SparkSession, dir: String, epochCap: Int): DataFrame =
    unimaxAllocFrom(docs(s, dir), epochCap)

  /** [[unimaxAlloc]] over an arbitrary (lang, text, …) frame — the
    * dedup-aware mixture (q123) feeds it the keeper-only corpus.
    */
  private[graft] def unimaxAllocFrom(d: DataFrame, epochCap: Int): DataFrame = {
    val avail = d
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .groupBy("lang").agg(sum(col("n_tok")).as("avail_tokens"))
    val tot = avail.agg(sum(col("avail_tokens")).as("total_avail"),
      count(lit(1)).as("n_langs"))
    val byCap = Window.orderBy(col("cap_tokens"), col("lang"))
    val full = byCap.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    avail.crossJoin(broadcast(tot))
      .withColumn("budget", expr("(total_avail * 4) div 5"))
      .withColumn("cap_tokens", col("avail_tokens") * epochCap)
      .withColumn("rk", row_number().over(byCap))
      .withColumn("p_before", coalesce(
        sum(col("cap_tokens")).over(byCap.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("is_capped",
        (col("cap_tokens") * (col("n_langs") - col("rk") + 1) + col("p_before")
          <= col("budget")).cast("int"))
      .withColumn("k_capped", sum(col("is_capped")).over(full))
      .withColumn("p_capped", coalesce(
        sum(when(col("is_capped") === 1, col("cap_tokens"))).over(full), lit(0L)))
      .withColumn("level",
        (col("budget") - col("p_capped")).cast("double") /
          (col("n_langs") - col("k_capped")))
      .withColumn("alloc_tokens", Num.roundD(
        when(col("is_capped") === 1, col("cap_tokens").cast("double"))
          .otherwise(col("level"))))
      .select("lang", "avail_tokens", "cap_tokens", "is_capped",
        "alloc_tokens", "budget")
  }

  /** Shared oracle CTE chain for the UniMax waterfall; ends at `o`
    * (lang, avail_tokens, cap_tokens, is_capped, alloc_tokens, budget) —
    * the SQL mirror of [[unimaxAlloc]].
    */
  private def sqlUnimaxCtes(epochCap: Int, from: String = "documents"): String =
    s"""a AS (
       |  SELECT lang,
       |    CAST(SUM(len(string_split(lower(trim(text)), ' '))) AS BIGINT)
       |      AS avail_tokens
       |  FROM $from GROUP BY lang),
       |t AS (
       |  SELECT CAST(SUM(avail_tokens) AS BIGINT) AS total_avail,
       |    COUNT(*) AS n_langs FROM a),
       |c AS (
       |  SELECT lang, avail_tokens, (total_avail * 4) // 5 AS budget, n_langs,
       |    avail_tokens * $epochCap AS cap_tokens
       |  FROM a, t),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (ORDER BY cap_tokens, lang) AS rk,
       |    COALESCE(SUM(cap_tokens) OVER (ORDER BY cap_tokens, lang
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p_before
       |  FROM c),
       |f AS (
       |  SELECT *, CAST(cap_tokens * (n_langs - rk + 1) + p_before <= budget
       |    AS INT) AS is_capped FROM r),
       |g AS (
       |  SELECT *,
       |    CAST(SUM(is_capped) OVER () AS BIGINT) AS k_capped,
       |    CAST(COALESCE(SUM(CASE WHEN is_capped = 1 THEN cap_tokens END)
       |      OVER (), 0) AS BIGINT) AS p_capped
       |  FROM f),
       |o AS (
       |  SELECT lang, avail_tokens, cap_tokens, is_capped,
       |    ${Num.sqlRoundD("CASE WHEN is_capped = 1 THEN CAST(cap_tokens AS DOUBLE) ELSE CAST(budget - p_capped AS DOUBLE) / (n_langs - k_capped) END")} AS alloc_tokens,
       |    budget
       |  FROM g)""".stripMargin

  val q100Sql: String =
    s"""WITH ${sqlUnimaxCtes(1)}
       |SELECT lang, avail_tokens, cap_tokens, is_capped, alloc_tokens,
       |  ${Num.sqlRoundD("alloc_tokens / avail_tokens")} AS epochs_used,
       |  ${Num.sqlRoundD("alloc_tokens / budget")} AS weight
       |FROM o
       |ORDER BY lang""".stripMargin

  /** Per-document mixture draw shared by q103 (the report) and q104
    * (the order manifest): q100's allocation joined back onto the
    * corpus, epochs split into guaranteed full copies plus one
    * hash-thresholded fractional draw.
    */
  private def mixtureCore(s: SparkSession, dir: String, epochCap: Int): DataFrame = {
    val alloc = unimaxAlloc(s, dir, epochCap)
      .select("lang", "avail_tokens", "alloc_tokens")
    docs(s, dir)
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .join(broadcast(alloc), Seq("lang"))
      .withColumn("epochs", col("alloc_tokens") / col("avail_tokens"))
      .withColumn("full_copies", floor(col("epochs")).cast("int"))
      .withColumn("frac_thresh",
        floor((col("epochs") - col("full_copies")) * lit(16777216.0)).cast("long"))
      .withColumn("hv", hex24("mmix", col("doc_id")))
      .withColumn("frac_kept", (col("hv") < col("frac_thresh")).cast("int"))
      .withColumn("n_copies", col("full_copies") + col("frac_kept"))
  }

  /** Shared oracle CTE chain for the mixture draw; extends
    * [[sqlUnimaxCtes]] and ends at `k` (doc_id, lang, n_tok,
    * full_copies, frac_kept, n_copies) — the SQL mirror of
    * [[mixtureCore]].
    */
  private def sqlMixtureCtes(epochCap: Int): String =
    s"""${sqlUnimaxCtes(epochCap)},
       |d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok,
       |    ${sqlSaltedMd5("mmix", "doc_id")} AS h
       |  FROM documents),
       |j AS (
       |  SELECT d.doc_id, d.lang, d.n_tok, d.h,
       |    o.alloc_tokens / o.avail_tokens AS epochs
       |  FROM d JOIN o USING (lang)),
       |e AS (
       |  SELECT doc_id, lang, n_tok, h,
       |    CAST(FLOOR(epochs) AS INT) AS full_copies,
       |    CAST(FLOOR((epochs - FLOOR(epochs)) * 16777216.0) AS BIGINT)
       |      AS frac_thresh
       |  FROM j),
       |k AS (
       |  SELECT doc_id, lang, n_tok, full_copies,
       |    CAST($sqlHex24 < frac_thresh AS INT) AS frac_kept,
       |    full_copies + CAST($sqlHex24 < frac_thresh AS INT) AS n_copies
       |  FROM e)""".stripMargin

  /** q103: mixture materialization — the draw that turns q100's UniMax
    * allocation into per-document sampling decisions a data loader can
    * execute. A language allocated e epochs contributes floor(e) full
    * copies of every document plus one fractional pass that keeps each
    * document with probability e − floor(e) — decided by a salted
    * 24-bit hash against a fixed threshold, never `rand()`, so the
    * drawn corpus is reproducible from doc_id alone and stable under
    * re-runs and task retries (this family's standing contract). Run at
    * epochCap = 2: on this near-balanced corpus no 2-epoch cap binds,
    * every language draws at the common water level, and the
    * lowest-supply languages land above one epoch — exercising the
    * full-copies ≥ 1 path the capped q100 default never reaches.
    *
    * Scale shape: the allocation is a languages-frame broadcast; the
    * draw itself is per-row hash arithmetic at scan speed — the only
    * corpus-sized shuffle is q100's per-lang token count (plus the
    * harness ORDER BY).
    */
  def q103MixtureDraw(s: SparkSession, dir: String, epochCap: Int = 2): DataFrame =
    mixtureCore(s, dir, epochCap)
      .select("doc_id", "lang", "n_tok", "full_copies", "frac_kept", "n_copies")
      .orderBy("doc_id")

  val q103Sql: String =
    s"""WITH ${sqlMixtureCtes(2)}
       |SELECT doc_id, lang, n_tok, full_copies, frac_kept, n_copies
       |FROM k
       |ORDER BY doc_id""".stripMargin

  /** q104: sharded training-order manifest — the artifact a distributed
    * data loader actually consumes: every materialized copy from the
    * q103 draw is assigned a shard by salted hash and a position within
    * its shard by a second independent hash order. Within-shard order
    * is a uniform deterministic shuffle (the md5 order is independent
    * of doc_id order, source, and language, so consecutive samples are
    * decorrelated — the property epoch-level training needs), and the
    * global order is the standard shard-interleave. No global window:
    * position is per-shard (numShards scales with the cluster), so the
    * manifest writes at full parallelism at any corpus size — the
    * single-partition global permutation a naive ORDER BY md5 would
    * plan is exactly what this operator exists to avoid.
    */
  def q104TrainOrder(s: SparkSession, dir: String, numShards: Int = 16,
      epochCap: Int = 2): DataFrame = {
    val key = concat_ws(":",
      col("doc_id").cast("string"), col("copy_idx").cast("string"))
    val c = mixtureCore(s, dir, epochCap)
      .filter(col("n_copies") >= 1)
      .withColumn("copy_idx", explode(expr("sequence(0, n_copies - 1)")))
      .withColumn("okey", md5(concat(lit("ord:"), key)))
      .withColumn("shard", (hex24("shard", key) % numShards).cast("int"))
    val w = Window.partitionBy("shard")
      .orderBy(col("okey"), col("doc_id"), col("copy_idx"))
    c.withColumn("pos", row_number().over(w))
      .select("shard", "pos", "doc_id", "copy_idx", "lang")
      .orderBy("shard", "pos")
  }

  val q104Sql: String =
    s"""WITH ${sqlMixtureCtes(2)},
       |m AS (
       |  SELECT doc_id, lang, n_copies FROM k WHERE n_copies >= 1),
       |x AS (
       |  SELECT doc_id, lang, unnest(range(n_copies)) AS copy_idx FROM m),
       |kk AS (
       |  SELECT doc_id, lang, copy_idx,
       |    md5('ord:' || CAST(doc_id AS VARCHAR) || ':' ||
       |      CAST(copy_idx AS VARCHAR)) AS okey,
       |    ${sqlSaltedMd5("shard",
            "CAST(doc_id AS VARCHAR) || ':' || CAST(copy_idx AS VARCHAR)")} AS h
       |  FROM x),
       |ss AS (
       |  SELECT doc_id, lang, copy_idx, okey,
       |    CAST($sqlHex24 % 16 AS INT) AS shard
       |  FROM kk)
       |SELECT shard,
       |  ROW_NUMBER() OVER (PARTITION BY shard
       |    ORDER BY okey, doc_id, copy_idx) AS pos,
       |  doc_id, copy_idx, lang
       |FROM ss
       |ORDER BY shard, pos""".stripMargin

  // --------------------------------------------------------------- q123

  /** q123: DEDUP-AWARE mixture allocation — the composition subtlety
    * q100 alone misses: UniMax budgets languages by available tokens,
    * and a language whose supply is inflated by duplicate documents
    * (a re-crawled mirror, a boilerplate farm) draws a budget it
    * cannot honestly fill — the trainer then repeats the duplicates it
    * should have dropped. This operator computes the allocation on the
    * KEEPER-ONLY corpus (q46's near-dup clusters collapsed to their
    * min-id canonicals) and reports, per language, the raw vs deduped
    * supply, what dedup removed, and the allocation/weight the CLEAN
    * supply earns. Composing dedup × mixture is exactly how a
    * production run sequences them (Curate dedups before it packs and
    * manifests); this query makes the budget shift oracle-visible.
    *
    * Scale shape: the labels pipeline is q46's (the operator's cost,
    * self-contained by the suite contract — Curate shares ONE
    * persisted label table in production); the raw and deduped
    * per-lang token counts are two partial-aggregated groupBys; the
    * water-filling runs on the languages frame.
    */
  def q123DedupAwareMixture(s: SparkSession, dir: String,
                            epochCap: Int = 2): DataFrame = {
    val corpus = Dedup.corpus(s, dir)
    val raw = corpus
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .groupBy("lang").agg(sum(col("n_tok")).as("avail_raw_tokens"))
    val keepers = Clusters.q46DedupClusters(s, dir)
      .filter(col("is_canonical")).select("doc_id")
    val alloc = unimaxAllocFrom(corpus.join(keepers, "doc_id"), epochCap)
    // LEFT join from raw (ADVICE r10): a language whose every document
    // is a non-canonical member of a cross-language near-dup cluster
    // vanishes from the deduped supply entirely — the report must SHOW
    // that language (supply 0, allocation 0, 100% removed), not omit
    // the row; a fully-mirrored language is the loudest finding a
    // dedup-aware mixture can surface
    raw.join(alloc, Seq("lang"), "left")
      .withColumn("avail_tokens", coalesce(col("avail_tokens"), lit(0L)))
      .withColumn("is_capped", coalesce(col("is_capped"), lit(0)))
      .withColumn("alloc_tokens", coalesce(col("alloc_tokens"), lit(0.0)))
      .withColumn("removed_tokens",
        col("avail_raw_tokens") - col("avail_tokens"))
      .withColumn("removed_pct", Num.roundD(
        col("removed_tokens").cast("double") / col("avail_raw_tokens")))
      .withColumn("weight",
        coalesce(Num.roundD(col("alloc_tokens") / col("budget")), lit(0.0)))
      .select(col("lang"), col("avail_raw_tokens"),
        col("avail_tokens").as("avail_dedup_tokens"),
        col("removed_tokens"), col("removed_pct"),
        col("is_capped"), col("alloc_tokens"), col("weight"))
      .orderBy("lang")
  }

  val q123Sql: String =
    s"""WITH RECURSIVE corpus AS (${Dedup.corpusSql}),
       |${Dedup.sqlMinhashCte("corpus")},
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM mh WHERE n_shared_bands >= 4),
       |bidir AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |nodes AS (SELECT doc_id AS id FROM corpus),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT b.dst, r.lbl FROM reach r JOIN bidir b ON b.src = r.id),
       |labels AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
       |ded AS (
       |  SELECT c.* FROM corpus c
       |  JOIN labels l ON l.id = c.doc_id AND l.id = l.cluster_id),
       |raw AS (
       |  SELECT lang,
       |    CAST(SUM(len(string_split(lower(trim(text)), ' '))) AS BIGINT)
       |      AS avail_raw_tokens
       |  FROM corpus GROUP BY lang),
       |${sqlUnimaxCtes(2, "ded")}
       |SELECT raw.lang, avail_raw_tokens,
       |  COALESCE(avail_tokens, CAST(0 AS BIGINT)) AS avail_dedup_tokens,
       |  avail_raw_tokens - COALESCE(avail_tokens, CAST(0 AS BIGINT)) AS removed_tokens,
       |  ${Num.sqlRoundD("CAST(avail_raw_tokens - COALESCE(avail_tokens, CAST(0 AS BIGINT)) AS DOUBLE) / avail_raw_tokens")} AS removed_pct,
       |  COALESCE(is_capped, CAST(0 AS INT)) AS is_capped,
       |  COALESCE(alloc_tokens, 0.0) AS alloc_tokens,
       |  COALESCE(${Num.sqlRoundD("alloc_tokens / budget")}, 0.0) AS weight
       |FROM raw LEFT JOIN o USING (lang)
       |ORDER BY raw.lang""".stripMargin

  // --------------------------------------------------------------- q121

  /** q121: pack-efficiency report — the accounting a trainer reads
    * beside q50's packed stream: per (lang, shard) lane, document and
    * token totals, the exact pack count the contiguous-concat regime
    * produces (⌈total/budget⌉ — only the final pack is partial), the
    * padding that last pack carries, the fill factor, how many
    * documents straddle a pack boundary (the cross-document-attention
    * exposure of the concat regime), and how many exceed the budget
    * outright (must be split however the stream is cut). These are the
    * numbers that decide budget and shard count before a training run:
    * fill says what padding costs, straddle says what concat costs.
    *
    * Scale shape: one aggregate over q50's per-document frame — the
    * pack window q50 already pays is the only corpus-sized work, and
    * the report collapses to |langs| × |shards| rows.
    */
  def q121PackReport(s: SparkSession, dir: String, budget: Int = 512): DataFrame =
    q50PackSequences(s, dir, budget)
      .groupBy("lang", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(col("straddles").cast("long")).as("straddle_docs"),
        sum(when(col("n_tok") > budget, 1L).otherwise(0L)).as("oversize_docs"))
      .withColumn("n_packs",
        expr(s"(total_tokens + ${budget - 1}) div $budget"))
      .withColumn("pad_tokens", col("n_packs") * budget - col("total_tokens"))
      .withColumn("fill", Num.roundD(
        col("total_tokens").cast("double") / (col("n_packs") * budget).cast("double")))
      .select("lang", "shard", "n_docs", "total_tokens", "n_packs",
        "pad_tokens", "fill", "straddle_docs", "oversize_docs")
      .orderBy("lang", "shard")

  val q121Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, CAST(doc_id % 32 AS INT) AS shard,
       |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, shard, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id) AS tok_end
       |  FROM t),
       |d AS (
       |  SELECT lang, shard, n_tok,
       |    CAST((tok_end - 1) // 512 > (tok_end - n_tok) // 512 AS INT) AS straddles
       |  FROM c),
       |g AS (
       |  SELECT lang, shard, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       |    CAST(SUM(straddles) AS BIGINT) AS straddle_docs,
       |    CAST(SUM(CASE WHEN n_tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS oversize_docs
       |  FROM d GROUP BY lang, shard)
       |SELECT lang, shard, n_docs, total_tokens,
       |  CAST((total_tokens + 511) // 512 AS BIGINT) AS n_packs,
       |  CAST((total_tokens + 511) // 512 * 512 - total_tokens AS BIGINT)
       |    AS pad_tokens,
       |  ${Num.sqlRoundD("CAST(total_tokens AS DOUBLE) / CAST((total_tokens + 511) // 512 * 512 AS DOUBLE)")} AS fill,
       |  straddle_docs, oversize_docs
       |FROM g
       |ORDER BY lang, shard""".stripMargin

  // --------------------------------------------------------------- q114

  /** q114: temperature-scaled mixture policy comparison — the OTHER
    * standard multilingual/multi-source sampling family (mC4/mT5's
    * p_i ∝ n_i^τ, Xue et al. 2021; XLM-R uses the same form at
    * τ = 0.7), laid side by side with proportional (τ = 1) and uniform
    * (τ = 0) so the q100 UniMax choice is an informed one: per
    * language, the three policy weights, the epochs temperature
    * sampling would spend at q100's token budget, and the
    * low-resource boost factor p_temp / p_prop. The known failure mode
    * the report surfaces is exactly why UniMax exists (Chung et al.
    * 2023): temperature sampling sets epochs implicitly — a
    * low-supply language can silently repeat far past memorization
    * territory, which the `risk` column flags at the 4-epoch line.
    *
    * Numeric discipline: n_i^τ is computed as exp(τ · ln n_i) with the
    * ln quantized at 6dp first (q92's libm rule; exp is bit-identical
    * cross-engine per the Φ probe), the weight re-quantized at 6dp,
    * and the normalizer an exact decimal sum — both engines divide the
    * SAME doubles. Scale shape: q100's — one corpus-sized per-lang
    * token groupBy; everything after runs on the languages frame.
    */
  def q114TemperatureMixture(s: SparkSession, dir: String,
                             tau: Double = 0.7): DataFrame = {
    val avail = docs(s, dir)
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .groupBy("lang").agg(sum(col("n_tok")).as("avail_tokens"))
    val full = Window.orderBy(col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    avail
      .withColumn("w_temp",
        Num.roundD(exp(lit(tau) * Num.roundD(log(col("avail_tokens").cast("double")), 6)), 6))
      .withColumn("total_avail", sum(col("avail_tokens")).over(full))
      .withColumn("n_langs", count(lit(1)).over(full))
      .withColumn("w_sum", Num.exactSum(col("w_temp")).over(full).cast("double"))
      .withColumn("budget", expr("(total_avail * 4) div 5"))
      .withColumn("p_prop", Num.roundD(
        col("avail_tokens").cast("double") / col("total_avail"), 6))
      .withColumn("p_temp", Num.roundD(col("w_temp") / col("w_sum"), 6))
      .withColumn("p_unif", Num.roundD(lit(1.0) / col("n_langs"), 6))
      .withColumn("epochs_temp", Num.roundD(
        col("p_temp") * col("budget") / col("avail_tokens"), 6))
      .withColumn("boost", Num.roundD(col("p_temp") / col("p_prop"), 6))
      .withColumn("risk",
        when(col("epochs_temp") > 4.0, "oversampled").otherwise("ok"))
      .select("lang", "avail_tokens", "p_prop", "p_temp", "p_unif",
        "epochs_temp", "boost", "risk")
      .orderBy("lang")
  }

  val q114Sql: String = {
    val wTemp = Num.sqlRoundD(
      s"EXP(0.7 * ${Num.sqlRoundD("LN(CAST(avail_tokens AS DOUBLE))", 6)})", 6)
    s"""WITH a AS (
       |  SELECT lang,
       |    CAST(SUM(len(string_split(lower(trim(text)), ' '))) AS BIGINT)
       |      AS avail_tokens
       |  FROM documents GROUP BY lang),
       |b AS (
       |  SELECT lang, avail_tokens, $wTemp AS w_temp FROM a),
       |t AS (
       |  SELECT CAST(SUM(avail_tokens) AS BIGINT) AS total_avail,
       |    COUNT(*) AS n_langs,
       |    CAST(SUM(CAST(w_temp AS DECIMAL(25,6))) AS DOUBLE) AS w_sum
       |  FROM b),
       |c AS (
       |  SELECT lang, avail_tokens, w_temp, total_avail, n_langs, w_sum,
       |    (total_avail * 4) // 5 AS budget
       |  FROM b, t),
       |d AS (
       |  SELECT lang, avail_tokens,
       |    ${Num.sqlRoundD("CAST(avail_tokens AS DOUBLE) / total_avail", 6)} AS p_prop,
       |    ${Num.sqlRoundD("w_temp / w_sum", 6)} AS p_temp,
       |    ${Num.sqlRoundD("1.0 / n_langs", 6)} AS p_unif,
       |    budget
       |  FROM c)
       |SELECT lang, avail_tokens, p_prop, p_temp, p_unif,
       |  ${Num.sqlRoundD("p_temp * budget / avail_tokens", 6)} AS epochs_temp,
       |  ${Num.sqlRoundD("p_temp / p_prop", 6)} AS boost,
       |  CASE WHEN ${Num.sqlRoundD("p_temp * budget / avail_tokens", 6)} > 4.0
       |    THEN 'oversampled' ELSE 'ok' END AS risk
       |FROM d
       |ORDER BY lang""".stripMargin
  }

  // --------------------------------------------------------------- q134

  /** q134: pack-budget ablation — q50's packing arithmetic swept over
    * candidate context lengths in ONE pass: per budget, how many docs
    * straddle a pack boundary (truncate-or-continue cases at training
    * time) and how much of the pack volume is end-of-shard padding.
    * This is the artifact that picks a context length from the DATA —
    * the q131/q96 threshold-sweep discipline applied to the packing
    * stage. The running totals (tok_start/tok_end) are budget-
    * INDEPENDENT, so the sweep is row-local arithmetic against a 3-row
    * literal frame: three budgets cost one packing pass, not three.
    *
    * Scale shape: q50's per-(lang, shard) window is the only
    * corpus-sized work (paid once); both rollups are partial-aggregated
    * groupBys to a 3-row output.
    */
  def q134BudgetSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    // persisted: the straddle rollup and the pack rollup both consume
    // the windowed frame — without the pin the corpus scan + window
    // shuffle would run twice (harness sweeps in-query pins)
    val base = docs(s, dir)
      .withColumn("shard", (col("doc_id") % 32).cast("int"))
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tok"))
      .select("lang", "shard", "n_tok", "tok_start", "tok_end")
      .persist()
    val budgets = Seq(256, 512, 1024).toDF("budget")
    val docAgg = base.crossJoin(broadcast(budgets))
      .withColumn("straddles",
        (expr("(tok_end - 1) div budget") > expr("tok_start div budget"))
          .cast("int"))
      .groupBy("budget").agg(
        count(lit(1)).as("n_docs"),
        sum("straddles").as("straddle_docs"))
    val packAgg = base.groupBy("lang", "shard")
      .agg(max("tok_end").as("total_toks"))
      .crossJoin(broadcast(budgets))
      .withColumn("packs", expr("(total_toks + budget - 1) div budget"))
      .groupBy("budget").agg(
        sum("packs").as("n_packs"),
        sum(col("packs") * col("budget") - col("total_toks"))
          .as("padding_tokens"),
        sum("total_toks").as("total_tokens"))
    docAgg.join(packAgg, "budget")
      .select(col("budget"), col("n_docs"), col("straddle_docs"),
        Num.roundD(col("straddle_docs").cast("double") * lit(100.0) /
          col("n_docs"), 4).as("straddle_pct"),
        col("n_packs"), col("total_tokens"), col("padding_tokens"),
        Num.roundD(col("padding_tokens").cast("double") * lit(100.0) /
          (col("n_packs") * col("budget")).cast("double"), 4)
          .as("padding_pct"))
      .orderBy("budget")
  }

  val q134Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, CAST(doc_id % 32 AS INT) AS shard,
       |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, shard, n_tok,
       |    SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id) AS tok_end
       |  FROM t),
       |b AS (SELECT * FROM (VALUES (256), (512), (1024)) v(budget)),
       |da AS (
       |  SELECT budget, COUNT(*) AS n_docs,
       |    CAST(SUM(CAST((tok_end - 1) // budget >
       |      (tok_end - n_tok) // budget AS INT)) AS BIGINT) AS straddle_docs
       |  FROM c, b GROUP BY budget),
       |st AS (
       |  SELECT lang, shard, MAX(tok_end) AS total_toks
       |  FROM c GROUP BY 1, 2),
       |pa AS (
       |  SELECT budget,
       |    CAST(SUM((total_toks + budget - 1) // budget) AS BIGINT) AS n_packs,
       |    CAST(SUM((total_toks + budget - 1) // budget * budget - total_toks)
       |      AS BIGINT) AS padding_tokens,
       |    CAST(SUM(total_toks) AS BIGINT) AS total_tokens
       |  FROM st, b GROUP BY budget)
       |SELECT da.budget, n_docs, straddle_docs,
       |  ${Num.sqlRoundD("CAST(straddle_docs AS DOUBLE) * 100.0 / n_docs", 4)}
       |    AS straddle_pct,
       |  n_packs, total_tokens, padding_tokens,
       |  ${Num.sqlRoundD(
             "CAST(padding_tokens AS DOUBLE) * 100.0 / CAST(n_packs * budget AS DOUBLE)", 4)}
       |    AS padding_pct
       |FROM da JOIN pa USING (budget)
       |ORDER BY da.budget""".stripMargin

  // --------------------------------------------------------------- q126

  /** q126: weight-proportional sample WITHOUT replacement — priority
    * sampling (Duffield–Lund–Thorup, JACM 54(6) 2007): per language,
    * the k documents with the highest priority w/u, where w is the
    * document's size and u a per-document uniform draw. Unlike the
    * uniform stratified sample (q48), inclusion probability is
    * proportional to size, and the Horvitz–Thompson estimate
    * max(w, τ) — τ the (k+1)-th priority — makes the k-row sample an
    * UNBIASED estimator of each language's total token mass, so a
    * 100 TB corpus can be audited from a few thousand rows with a
    * quantified error (the rel_err column makes it oracle-visible).
    *
    * Determinism across engines: u is the house hex24 draw, and the
    * priority is (w·2²⁴)/(u+1) — one IEEE multiply and one divide of
    * exactly-represented integers, both correctly rounded, so Spark
    * and DuckDB rank the SAME doubles (no transcendentals: the
    * textbook u^(1/w) key would hit libm pow divergence; w/u is the
    * DLT-equivalent ordering that stays exact).
    *
    * Scale shape: one scan; the rank filter compiles to
    * WindowGroupLimit (per-partition top-(k+1) before the exchange,
    * O(k) state per stratum); τ and the per-language totals are
    * 25-row broadcast frames.
    */
  def q126PrioritySample(s: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val base = docs(s, dir)
      .withColumn("w", col("n_chars"))
      .withColumn("priority",
        (col("w").cast("double") * lit(16777216.0)) /
          (hex24("prio", col("doc_id")) + lit(1L)).cast("double"))
    val byPrio = Window.partitionBy("lang")
      .orderBy(col("priority").desc, col("doc_id"))
    val ranked = base.withColumn("rk", row_number().over(byPrio))
      .filter(col("rk") <= k + 1)
    val tauF = ranked.filter(col("rk") === k + 1)
      .select(col("lang"), col("priority").as("tau"))
    val totals = docs(s, dir).groupBy("lang")
      .agg(sum("n_chars").as("lang_total_w"))
    val langW = Window.partitionBy("lang")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked.filter(col("rk") <= k)
      .join(broadcast(tauF), Seq("lang"), "left")
      .join(broadcast(totals), Seq("lang"))
      .withColumn("est_w", greatest(col("w").cast("double"),
        coalesce(col("tau"), lit(0.0))))
      .withColumn("est_total",
        Num.exactSum(col("est_w")).over(langW).cast("double"))
      .select(col("lang"), col("rk"), col("doc_id"), col("w"),
        Num.roundD(col("priority")).as("priority_r"),
        Num.roundD(col("est_w")).as("est_w_r"),
        col("lang_total_w"),
        Num.roundD((col("est_total") - col("lang_total_w").cast("double")) /
          col("lang_total_w").cast("double"), 6).as("rel_err_r"))
      .orderBy("lang", "rk")
  }

  val q126Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, n_chars AS w,
       |    ${sqlSaltedMd5("prio", "doc_id")} AS h
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, lang, w,
       |    (CAST(w AS DOUBLE) * 16777216.0) /
       |      CAST($sqlHex24 + 1 AS DOUBLE) AS priority
       |  FROM t),
       |r AS (
       |  SELECT doc_id, lang, w, priority,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY priority DESC, doc_id) AS rk
       |  FROM p),
       |tauf AS (SELECT lang, priority AS tau FROM r WHERE rk = 9),
       |tot AS (
       |  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS lang_total_w
       |  FROM documents GROUP BY lang),
       |sm AS (
       |  SELECT lang, rk, doc_id, w, priority,
       |    GREATEST(CAST(w AS DOUBLE), COALESCE(tau, 0.0)) AS est_w,
       |    lang_total_w
       |  FROM r LEFT JOIN tauf USING (lang) JOIN tot USING (lang)
       |  WHERE rk <= 8),
       |ws AS (
       |  SELECT lang, rk, doc_id, w, priority, est_w, lang_total_w,
       |    CAST(SUM(CAST(est_w AS DECIMAL(25,6)))
       |      OVER (PARTITION BY lang) AS DOUBLE) AS est_total
       |  FROM sm)
       |SELECT lang, rk, doc_id, w,
       |  ${Num.sqlRoundD("priority")} AS priority_r,
       |  ${Num.sqlRoundD("est_w")} AS est_w_r,
       |  lang_total_w,
       |  ${Num.sqlRoundD(
             "(est_total - CAST(lang_total_w AS DOUBLE)) / CAST(lang_total_w AS DOUBLE)", 6)}
       |    AS rel_err_r
       |FROM ws
       |ORDER BY lang, rk""".stripMargin

  // --------------------------------------------------------------- q127

  /** Row-local curriculum stage assignment (round 12 — VERDICT r11 #1):
    * the scale-safe replacement for a per-language NTILE. NTILE over
    * `Window.partitionBy("lang")` sorts each language's ENTIRE document
    * set inside ONE task (lang is a ~4-value key — exactly the
    * single-reducer window shape SURVEY §4 bans); here the difficulty
    * signal arrives QUANTIZED (the q15 midrank discipline — 6dp is far
    * finer than any curriculum needs), the per-(lang, qdiff) histogram
    * is one combiner-friendly shuffle bounded by the VALUE DOMAIN
    * rather than the corpus, stage boundaries fall out of the
    * histogram's cumulative doc fraction, and every document picks its
    * stage through a broadcast join on (lang, qdiff) — row-local, no
    * corpus sort anywhere. Ties share a quantized value and therefore a
    * stage: NTILE's positional ±1 balance becomes a tie-block tolerance,
    * which is the property a DISTRIBUTED curriculum actually wants
    * (positional splits of ties are partition-order-dependent).
    *
    * `d` must carry `lang` and a quantized double `qdiff`; every input
    * row comes back with a `stage` in [1, stages]. The only windows are
    * running sums over the histogram — the q100 bounded-frame
    * exception, never the corpus (PlanSpec asserts every Window in the
    * plan sits above an aggregation).
    */
  /** Stage assignment over a (lang, qdiff, _docs, …) histogram: docs
    * STRICTLY before each quantized value (one row per distinct (lang,
    * qdiff), so the ROWS frame is exact and tie-free), language totals
    * broadcast back, stage = which K-th of the corpus the block's FIRST
    * doc falls in (`div`, not `/` — both engines take the integer
    * floor). All histogram-sized.
    */
  private def stageBoundaries(g: DataFrame, stages: Int): DataFrame = {
    val before = Window.partitionBy("lang").orderBy("qdiff")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the totals join is NULL-SAFE too (review r12, second pass): a null
    // lang — an un-identified document stream — groups into its own
    // histogram AND totals row, but a usingColumn join evaluates
    // null = null as null and would drop the whole language, making the
    // downstream null-safe join dead code for exactly those rows
    val tot = g.groupBy("lang").agg(sum("_docs").as("_lang_docs"))
      .select(col("lang").as("_t_lang"), col("_lang_docs"))
    g.withColumn("_cum_before", coalesce(sum("_docs").over(before), lit(0L)))
      .join(broadcast(tot), col("lang") <=> col("_t_lang"))
      .drop("_t_lang")
      .withColumn("stage", least(lit(stages),
        expr(s"cast((_cum_before * $stages) div _lang_docs as int) + 1")))
  }

  def curriculumStages(d: DataFrame, stages: Int): DataFrame = {
    val g = d.groupBy("lang", "qdiff").agg(count(lit(1)).as("_docs"))
    // NULL-SAFE join back (review r12): groupBy builds a histogram row
    // for a null qdiff (an unscored document) and the boundaries assign
    // it a stage (nulls order first — the easiest slot, deterministic),
    // so a plain equi-join would silently DROP exactly those rows
    // (null != null) and break the every-row-comes-back contract
    val b = stageBoundaries(g, stages)
      .select(col("lang").as("_b_lang"), col("qdiff").as("_b_qdiff"),
        col("stage"))
    d.join(broadcast(b),
        col("lang") <=> col("_b_lang") && col("qdiff") <=> col("_b_qdiff"))
      .drop("_b_lang", "_b_qdiff")
  }

  /** The staged histogram the REGISTERED queries roll up from: token
    * sums ride the same one-pass histogram aggregate, so the stage-grain
    * report never joins back to the corpus — one scan, one
    * combiner-friendly shuffle, everything after histogram-sized
    * ([[curriculumStages]] is the doc-grain API a trainer materializes
    * its actual schedule through).
    */
  private def stagedHistogram(d: DataFrame, stages: Int): DataFrame =
    stageBoundaries(
      d.groupBy("lang", "qdiff")
        .agg(count(lit(1)).as("_docs"), sum("n_tok").as("_tok")), stages)

  /** q127: curriculum staging — each language's documents cut into
    * difficulty stages (easy → hard by mean token length, the classic
    * zero-model curriculum proxy from Bengio et al., ICML 2009), with
    * per-stage doc/token counts, the quantized difficulty band each
    * stage spans, and the cumulative token fraction a trainer has
    * consumed when the stage completes. The monotone min/max band
    * columns make the schedule's ordering property oracle-visible; the
    * cumulative fraction is what a curriculum scheduler reads to place
    * its pacing boundaries.
    *
    * Difficulty is n_chars/n_tok quantized to 6dp — one IEEE divide of
    * exact integers plus the [[Num.roundD]] formula, so both engines
    * bucket the SAME doubles (the bigram-LM score of q118 is the
    * model-based upgrade — q136 — over the same staging machinery,
    * which is score-agnostic). Scale shape (round 12 — the r11
    * per-language NTILE was the registry's one single-reducer window):
    * ONE corpus scan into a value-domain histogram carrying doc AND
    * token sums; stages, bands, and fractions all derive from the
    * histogram (the doc-grain broadcast-back assignment is
    * [[curriculumStages]], the API a trainer materializes its actual
    * schedule through).
    */
  def q127Curriculum(s: SparkSession, dir: String, stages: Int = 5): DataFrame = {
    val d = docs(s, dir)
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
      .withColumn("qdiff", Num.roundD(
        col("n_chars").cast("double") / col("n_tok").cast("double"), 6))
    curriculumRollup(stagedHistogram(d.select("lang", "n_tok", "qdiff"), stages))
  }

  /** The per-stage schedule rollup shared by q127 and q136, over the
    * [[stagedHistogram]]: stage-grain doc/token counts, the quantized
    * band each stage spans, and the cumulative token fraction.
    * Everything here is histogram-sized or smaller — the corpus was
    * touched exactly once, by the histogram aggregate.
    */
  private def curriculumRollup(staged: DataFrame): DataFrame = {
    val perStage = staged.groupBy("lang", "stage")
      .agg(sum("_docs").as("docs"),
        sum("_tok").as("stage_tokens"),
        min("qdiff").as("min_diff_r"),
        max("qdiff").as("max_diff_r"))
    // NULL-SAFE totals join (ADVICE r12): a null-lang histogram gets its
    // own perStage AND langTot rows, but a usingColumn join evaluates
    // null = null as null and would silently drop that language's
    // stages — undoing stageBoundaries' null-safe handling one frame
    // later. (Null QDIFF remains outside the REGISTERED q127/q136
    // contract: both derive qdiff from non-null arithmetic — q127's
    // n_tok ≥ 1 by split(), q136 drops unscorable docs — and their SQL
    // twins' equi-joins would diverge on it; the doc-grain
    // curriculumStages API is the fully null-safe surface.)
    val langTot = perStage.groupBy("lang")
      .agg(sum("stage_tokens").as("lang_tokens"))
      .select(col("lang").as("_lt_lang"), col("lang_tokens"))
    val cumW = Window.partitionBy("lang").orderBy("stage")
    perStage
      .withColumn("cum_tokens", sum("stage_tokens").over(cumW))
      .join(broadcast(langTot), col("lang") <=> col("_lt_lang"))
      .drop("_lt_lang")
      .withColumn("cum_frac_r", Num.roundD(
        col("cum_tokens").cast("double") / col("lang_tokens").cast("double"), 6))
      .select("lang", "stage", "docs", "stage_tokens", "min_diff_r",
        "max_diff_r", "cum_tokens", "cum_frac_r")
      .orderBy("lang", "stage")
  }

  val q127Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, lang, n_tok,
       |    ${Num.sqlRoundD(
             "CAST(n_chars AS DOUBLE) / CAST(n_tok AS DOUBLE)", 6)} AS qdiff
       |  FROM t),
       |g AS (SELECT lang, qdiff, COUNT(*) AS docs FROM d GROUP BY 1, 2),
       |b AS (
       |  SELECT lang, qdiff,
       |    COALESCE(SUM(docs) OVER (PARTITION BY lang ORDER BY qdiff
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_before,
       |    SUM(docs) OVER (PARTITION BY lang) AS lang_docs
       |  FROM g),
       |sb AS (
       |  SELECT lang, qdiff,
       |    LEAST(5, CAST((cum_before * 5) // lang_docs AS INT) + 1) AS stage
       |  FROM b),
       |sd AS (
       |  SELECT d.lang, d.n_tok, d.qdiff, sb.stage
       |  FROM d JOIN sb USING (lang, qdiff)),
       |ps AS (
       |  SELECT lang, stage, COUNT(*) AS docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS stage_tokens,
       |    MIN(qdiff) AS min_diff_r, MAX(qdiff) AS max_diff_r
       |  FROM sd GROUP BY lang, stage),
       |c AS (
       |  SELECT lang, stage, docs, stage_tokens, min_diff_r, max_diff_r,
       |    CAST(SUM(stage_tokens) OVER (PARTITION BY lang
       |      ORDER BY stage) AS BIGINT) AS cum_tokens,
       |    CAST(SUM(stage_tokens) OVER (PARTITION BY lang) AS BIGINT)
       |      AS lang_tokens
       |  FROM ps)
       |SELECT lang, stage, docs, stage_tokens, min_diff_r, max_diff_r,
       |  cum_tokens,
       |  ${Num.sqlRoundD(
             "CAST(cum_tokens AS DOUBLE) / CAST(lang_tokens AS DOUBLE)", 6)}
       |    AS cum_frac_r
       |FROM c
       |ORDER BY lang, stage""".stripMargin

  // --------------------------------------------------------------- q136

  /** q136: MODEL-staged curriculum (round 12 — VERDICT r11 #8, q127's
    * own docstring plan): the same [[curriculumStages]] boundary
    * machinery with difficulty = the q118 interpolated bigram-LM mean
    * NLL instead of the zero-model length proxy — the curriculum a
    * trainer actually schedules by (Bengio et al.'s "easy first" with a
    * learned easiness signal: low-perplexity boilerplate first,
    * implausible/hapax-dense text in the hardest stage). The score is
    * already 6dp-quantized (q118's cross-engine pin), so it IS the
    * qdiff histogram key — no extra rounding layer.
    *
    * Docs with fewer than two tokens have no bigram, no score, and drop
    * — a curriculum cannot place what the model cannot grade. Scale
    * shape: q118's model passes (two broadcast-joined head tables over
    * one bigram stream) into q127's staging shape (value-domain
    * histogram, boundaries broadcast back, row-local stage assignment,
    * bounded-frame rollup).
    */
  def q136PplCurriculum(s: SparkSession, dir: String, stages: Int = 5): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), col("lang"),
        split(lower(trim(col("text"))), " ").as("w"))
      .withColumn("n_tok", size(col("w")).cast("long"))
    val scored = TextOps.bigramAvgNll(d, Seq("doc_id", "lang", "n_tok"))
      .withColumnRenamed("avg_nll", "qdiff")
    curriculumRollup(stagedHistogram(
      scored.select("lang", "n_tok", "qdiff"), stages))
  }

  val q136Sql: String =
    s"""WITH dd AS (
       |  SELECT doc_id, lang, string_split(lower(trim(text)), ' ') AS w
       |  FROM documents),
       |t AS (SELECT doc_id, unnest(w) AS tok FROM dd),
       |f AS (SELECT tok, COUNT(*) AS ucnt FROM t GROUP BY tok),
       |tot AS (SELECT CAST(SUM(ucnt) AS BIGINT) AS total FROM f),
       |bgs AS (
       |  SELECT doc_id, lang, n_tok, w[i] AS a, w[i + 1] AS b FROM (
       |    SELECT doc_id, lang, w, CAST(len(w) AS BIGINT) AS n_tok,
       |      unnest(generate_series(1, len(w) - 1)) AS i
       |    FROM dd WHERE len(w) >= 2) z),
       |bf AS (SELECT a, b, COUNT(*) AS bcnt FROM bgs GROUP BY a, b),
       |sc AS (
       |  SELECT doc_id, lang, n_tok,
       |    ${Num.sqlRoundD(
            "-LN(CAST(bcnt AS DOUBLE) / (CAST(fa.ucnt AS DOUBLE) + 5.0) + " +
            "(5.0 / (CAST(fa.ucnt AS DOUBLE) + 5.0)) * " +
            "(CAST(fb.ucnt AS DOUBLE) / CAST(total AS DOUBLE)))", 6)} AS nll
       |  FROM bgs
       |  JOIN bf USING (a, b)
       |  JOIN f fa ON fa.tok = bgs.a
       |  JOIN f fb ON fb.tok = bgs.b
       |  CROSS JOIN tot),
       |pd AS (
       |  SELECT doc_id, lang, n_tok,
       |    ${Num.sqlAvg("nll", 6)} AS qdiff
       |  FROM sc GROUP BY doc_id, lang, n_tok),
       |g AS (SELECT lang, qdiff, COUNT(*) AS docs FROM pd GROUP BY 1, 2),
       |b AS (
       |  SELECT lang, qdiff,
       |    COALESCE(SUM(docs) OVER (PARTITION BY lang ORDER BY qdiff
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS cum_before,
       |    SUM(docs) OVER (PARTITION BY lang) AS lang_docs
       |  FROM g),
       |sb AS (
       |  SELECT lang, qdiff,
       |    LEAST(5, CAST((cum_before * 5) // lang_docs AS INT) + 1) AS stage
       |  FROM b),
       |sd AS (
       |  SELECT pd.lang, pd.n_tok, pd.qdiff, sb.stage
       |  FROM pd JOIN sb USING (lang, qdiff)),
       |ps AS (
       |  SELECT lang, stage, COUNT(*) AS docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS stage_tokens,
       |    MIN(qdiff) AS min_diff_r, MAX(qdiff) AS max_diff_r
       |  FROM sd GROUP BY lang, stage),
       |c AS (
       |  SELECT lang, stage, docs, stage_tokens, min_diff_r, max_diff_r,
       |    CAST(SUM(stage_tokens) OVER (PARTITION BY lang
       |      ORDER BY stage) AS BIGINT) AS cum_tokens,
       |    CAST(SUM(stage_tokens) OVER (PARTITION BY lang) AS BIGINT)
       |      AS lang_tokens
       |  FROM ps)
       |SELECT lang, stage, docs, stage_tokens, min_diff_r, max_diff_r,
       |  cum_tokens,
       |  ${Num.sqlRoundD(
             "CAST(cum_tokens AS DOUBLE) / CAST(lang_tokens AS DOUBLE)", 6)}
       |    AS cum_frac_r
       |FROM c
       |ORDER BY lang, stage""".stripMargin

  // --------------------------------------------------------------- q139

  /** q139: length-bucketed batching report — the padding-waste artifact
    * an inference/training batcher reads before choosing its bucketing:
    * documents bucket by power-of-two token-length cap (16 … 8192), and
    * per bucket the report shows docs, tokens, full batches of
    * `batchSize`, and the padding fraction when every sequence in a
    * batch pads to the bucket cap — against the one-bucket baseline
    * (everything pads to the GLOBAL max length), the waste bucketing
    * exists to eliminate. q134 sweeps the packing budget for
    * concat-and-pack training; this is the pad-don't-pack serving twin.
    *
    * Scale shape: ONE corpus scan — the cap is a row-local CASE ladder
    * (a quantile bucketing here would be the banned global sort; powers
    * of two are the fixed-boundary discipline q132 uses for its bins)
    * into one ≤ 10-bucket groupBy that also carries each bucket's max
    * length, and the global baseline derives from THAT frame by an
    * unpartitioned window — bounded by the bucket count (the q100
    * exception), so the corpus is never re-read for the baseline
    * (review r12: the first cut paid a second full scan for a 3-value
    * aggregate).
    */
  def q139LengthBuckets(s: SparkSession, dir: String,
      batchSize: Int = 16): DataFrame = {
    val d = docs(s, dir)
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), " ")).cast("long"))
    val caps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
    val cap = caps.foldRight(lit(8192L): Column)((c, acc) =>
      when(col("n_tok") <= c, lit(c)).otherwise(acc))
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    d.withColumn("cap", cap)
      .groupBy("cap")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        max("n_tok").as("_cap_max"))
      .withColumn("n_batches",
        expr(s"cast((n_docs + ${batchSize - 1}) div $batchSize as bigint)"))
      .withColumn("pad_frac_r", Num.roundD(lit(1.0) -
        col("n_tokens").cast("double") /
          (col("n_batches") * batchSize * col("cap")).cast("double"), 6))
      .withColumn("_g_docs", sum("n_docs").over(all))
      .withColumn("_g_tok", sum("n_tokens").over(all))
      .withColumn("_g_max", max("_cap_max").over(all))
      .withColumn("unbucketed_pad_frac_r", Num.roundD(lit(1.0) -
        col("_g_tok").cast("double") /
          (expr(s"cast((_g_docs + ${batchSize - 1}) div $batchSize as bigint)") *
            batchSize * col("_g_max")).cast("double"), 6))
      .select("cap", "n_docs", "n_tokens", "n_batches", "pad_frac_r",
        "unbucketed_pad_frac_r")
      .orderBy("cap")
  }

  val q139Sql: String = {
    val caseCap = Seq(16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
      .map(c => s"WHEN n_tok <= $c THEN $c").mkString(" ")
    s"""WITH t AS (
       |  SELECT CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
       |    AS n_tok
       |  FROM documents),
       |b AS (
       |  SELECT n_tok,
       |    CAST(CASE $caseCap ELSE 8192 END AS BIGINT) AS cap
       |  FROM t),
       |g AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS g_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS g_tok,
       |    CAST(MAX(n_tok) AS BIGINT) AS g_max
       |  FROM t),
       |gb AS (
       |  SELECT ${Num.sqlRoundD(
            "1.0 - CAST(g_tok AS DOUBLE) / " +
            "CAST(((g_docs + 15) // 16) * 16 * g_max AS DOUBLE)", 6)}
       |    AS unbucketed_pad_frac_r
       |  FROM g),
       |p AS (
       |  SELECT cap, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |  FROM b GROUP BY cap),
       |pb AS (
       |  SELECT cap, n_docs, n_tokens,
       |    CAST((n_docs + 15) // 16 AS BIGINT) AS n_batches
       |  FROM p)
       |SELECT cap, n_docs, n_tokens, n_batches,
       |  ${Num.sqlRoundD(
            "1.0 - CAST(n_tokens AS DOUBLE) / " +
            "CAST(n_batches * 16 * cap AS DOUBLE)", 6)} AS pad_frac_r,
       |  unbucketed_pad_frac_r
       |FROM pb CROSS JOIN gb
       |ORDER BY cap""".stripMargin
  }

  // --------------------------------------------------------------- q128

  /** q128: multi-epoch training order — q104's sharded manifest
    * extended to the axis real pretraining runs need: a DIFFERENT
    * deterministic permutation per epoch (epoch-salted hash order and
    * epoch-salted shard assignment), so no two epochs present data in
    * the same order or co-locate the same documents, yet any (epoch,
    * shard) is reproducible from the ids alone — a resumed run
    * re-materializes exactly the order it crashed in. The prev_shard /
    * moved columns make the reshuffle oracle-visible: a doc's shard in
    * epoch e is compared against its epoch e-1 home.
    *
    * Scale shape: the epoch fan-out is a row-local explode (output is
    * docs × epochs — the manifest a trainer consumes, written once);
    * position assignment shuffles per (epoch, shard), 24 balanced
    * partitions here; the moved flag adds one per-doc window over
    * epochs rows.
    */
  def q128EpochOrder(s: SparkSession, dir: String, epochs: Int = 3,
      numShards: Int = 8): DataFrame = {
    // sequence(0, epochs - 1) COUNTS DOWN for epochs < 1 (the Spark trap
    // Bpe.pairCounts documents), minting phantom negative epochs — fail
    // loudly instead
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val key = concat_ws(":",
      col("epoch").cast("string"), col("doc_id").cast("string"))
    val keyed = docs(s, dir).select("doc_id", "lang")
      .withColumn("epoch", explode(expr(s"sequence(0, ${epochs - 1})")))
      .withColumn("okey", md5(concat(lit("eord:"), key)))
      .withColumn("shard", (hex24("eshard", key) % numShards).cast("int"))
    val w = Window.partitionBy("epoch", "shard")
      .orderBy(col("okey"), col("doc_id"))
    val byDoc = Window.partitionBy("doc_id").orderBy("epoch")
    keyed.withColumn("pos", row_number().over(w))
      .withColumn("prev_shard", lag("shard", 1).over(byDoc))
      .withColumn("moved",
        when(col("prev_shard").isNull, lit(null).cast("int"))
          .otherwise((col("shard") =!= col("prev_shard")).cast("int")))
      .select("epoch", "shard", "pos", "doc_id", "lang", "prev_shard", "moved")
      .orderBy("epoch", "shard", "pos")
  }

  val q128Sql: String =
    s"""WITH x AS (
       |  SELECT doc_id, lang, unnest(range(3)) AS epoch FROM documents),
       |k AS (
       |  SELECT doc_id, lang, epoch,
       |    md5('eord:' || CAST(epoch AS VARCHAR) || ':' ||
       |      CAST(doc_id AS VARCHAR)) AS okey,
       |    ${sqlSaltedMd5("eshard",
            "CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS h
       |  FROM x),
       |ss AS (
       |  SELECT doc_id, lang, epoch, okey,
       |    CAST($sqlHex24 % 8 AS INT) AS shard
       |  FROM k),
       |o AS (
       |  SELECT epoch, shard,
       |    ROW_NUMBER() OVER (PARTITION BY epoch, shard
       |      ORDER BY okey, doc_id) AS pos,
       |    doc_id, lang,
       |    LAG(shard) OVER (PARTITION BY doc_id ORDER BY epoch) AS prev_shard
       |  FROM ss)
       |SELECT epoch, shard, pos, doc_id, lang, prev_shard,
       |  CASE WHEN prev_shard IS NULL THEN NULL
       |       ELSE CAST(shard <> prev_shard AS INT) END AS moved
       |FROM o
       |ORDER BY epoch, shard, pos""".stripMargin
}
