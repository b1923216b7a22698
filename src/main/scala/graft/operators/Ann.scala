package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space operators: cosine similarity search (exact top-k
  * baseline + LSH-bucketed scale path) and embedding-cosine near-dedup.
  *
  * Scale design: the exact path broadcasts only the (small) query set —
  * one pass over the corpus, no corpus×corpus product; the LSH paths
  * bucket by random-hyperplane sign fingerprints so candidate generation
  * is a shuffle join on bucket ids. Dot products run inside whole-stage
  * codegen via higher-order array functions (zip_with/aggregate) — no UDF,
  * no per-row JVM boxing beyond the array itself.
  */
object Ann {

  private val Dim = 64
  private val NumPlanes = 16
  /** Quantization scale: emb values become floor(x·10⁷) longs. */
  private val QScale = "10000000.0"

  /** ±1 sign-projection planes, 16 × 64 — the parity bit of the
    * engine-portable 60-bit md5 hash of "plane_i_j" (so the DuckDB oracle
    * re-derives the identical matrix from ITS md5 instead of needing 1024
    * literals pasted into the SQL). Sign random projection with Rademacher
    * (±1) entries has the same locality guarantees as Gaussian planes for
    * the hyperplane-LSH family.
    */
  private[operators] lazy val planeSigns: IndexedSeq[Seq[Long]] =
    (0 until NumPlanes).map { i =>
      (0 until Dim).map { j =>
        if ((graft.functions.Md5Long60.hashStr(s"plane_${i}_$j") & 1L) == 1L) 1L else -1L
      }
    }

  /** Oracle CTE producing the identical matrix as `planes(i, j, s)`. */
  private val sqlPlanesCte: String =
    s"""planes AS (
       |  SELECT i, j,
       |    CASE WHEN ${Dedup.sqlMd5Long60(
            "'plane_' || CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)")} & 1 = 1
       |      THEN 1 ELSE -1 END AS s
       |  FROM range(0, $NumPlanes) t(i), range(0, $Dim) u(j))""".stripMargin

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    // CPU-spread at the family's one loader (round 18 — Tuning.spreadSmall):
    // the embeddings file is single-row-group parquet, so every decimal
    // fold / quantize / fingerprint corpus pass downstream of this scan
    // otherwise runs as ONE task; the bounded round-robin exchange
    // no-ops at real corpus sizes. Only the dir-loaded oracle queries
    // ride this — the streaming/admission paths bring their own frames.
    graft.Tuning.spreadSmall(Tables.load(s, dir, "embeddings"))
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))

  /** Fused native cosine (graft.functions.CosineSimilarity): one codegen'd
    * loop per row, no intermediate arrays — the per-row inner kernel of
    * the IVF path (engine-specific double summation order, so the
    * oracle-checked paths use [[dotDec]] instead).
    */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Decimal-exact dot product of two double arrays: each product is
    * exact in double and its DECIMAL(25,12) rounding is engine-portable;
    * decimal addition is associative, so the fold equals the oracle's
    * unordered SUM bit-for-bit. Since round 5 this is the native
    * [[graft.functions.DotDecimal]] expression (one static call per row,
    * loop in plain Java) rather than the semantically-identical
    * `aggregate(zip_with(...))` fold, whose higher-order-function
    * machinery paid lambda binding and Decimal boxing per ELEMENT — the
    * swap held every consuming oracle green and cut the ANN verify
    * phases' time (measurements in PLANS.md).
    */
  private[graft] def dotDec(a: String, b: String): Column =
    call_function("dot_dec", col(a), col(b))

  /** Engine-portable cosine between two double-array columns (by NAME):
    * decimal dots + roundD — bit-identical to the oracle's replay.
    */
  private def cosineDec(a: String, b: String): Column =
    Num.roundD(dotDec(a, b).cast("double") /
      sqrt(dotDec(a, a).cast("double") * dotDec(b, b).cast("double")))

  /** Exact integer quantization: floor(x·10⁷) of each component. floor of
    * an IEEE double product is bit-deterministic in every engine (no
    * rounding-mode or summation-order concerns), which is what makes the
    * sign fingerprints — and therefore bucket assignment — oracle-portable.
    */
  private[operators] def quantize(emb: Column): Column =
    transform(emb, x => floor(x * lit(10000000.0)))

  /** 16-bit sign fingerprint of a QUANTIZED embedding: bit i is the sign
    * of the exact integer dot product with ±1 plane i. Pure long
    * arithmetic inside whole-stage codegen — zero float ambiguity.
    */
  private def planeBucket(qemb: Column): Column =
    (0 until NumPlanes).map { i =>
      val dot = aggregate(
        zip_with(qemb, typedLit(planeSigns(i)), _ * _), lit(0L), _ + _)
      when(dot >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Oracle CTE chain `ecorpus` → `eexpl` → `fp(vec_id, bucket)` replaying
    * [[embCorpus]] + [[quantize]] + [[planeBucket]]: the corpus with its
    * re-encoded batch, per-component quantized explode, and the 16-bit
    * sign fingerprint. Shared by q24 and q26.
    */
  private val sqlFingerprintCte: String =
    s"""ecorpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01)
       |  FROM embeddings WHERE vec_id % 5 = 0),
       |eexpl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v,
       |    CAST(FLOOR(unnest(emb) * $QScale) AS BIGINT) AS q
       |  FROM ecorpus),
       |$sqlPlanesCte,
       |pdot AS (
       |  SELECT e.vec_id, p.i, SUM(e.q * p.s) AS dot
       |  FROM eexpl e JOIN planes p ON e.j = p.j
       |  GROUP BY 1, 2),
       |fp AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN dot >= 0 THEN 1 << i ELSE 0 END) AS INT) AS bucket
       |  FROM pdot GROUP BY 1),
       |norms AS (
       |  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2
       |  FROM eexpl GROUP BY 1)""".stripMargin

  /** Oracle fragment: decimal dot + cosine for a pair CTE `$pairs(id_a,
    * id_b)` — mirrors [[cosineDec]].
    */
  private def sqlPairCosine(pairs: String, prefix: String = ""): String =
    s"""${prefix}pdots AS (
       |  SELECT p.id_a, p.id_b, SUM(CAST(ea.v * eb.v AS DECIMAL(25,12))) AS dotp
       |  FROM $pairs p
       |  JOIN eexpl ea ON ea.vec_id = p.id_a
       |  JOIN eexpl eb ON eb.vec_id = p.id_b AND eb.j = ea.j
       |  GROUP BY 1, 2),
       |${prefix}scored AS (
       |  SELECT d.id_a, d.id_b,
       |    ${Num.sqlRoundD(
            "CAST(d.dotp AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))")} AS cosine
       |  FROM ${prefix}pdots d
       |  JOIN norms na ON na.vec_id = d.id_a
       |  JOIN norms nb ON nb.vec_id = d.id_b)""".stripMargin

  /** Near-dup input: embeddings plus a deterministic "re-encoded batch" —
    * every 5th vector rescaled by 1.01 (same direction, cosine ≈ 1) under
    * a new id. The synthetic vectors are random, so genuine near-dups
    * would otherwise not exist to find.
    */
  def embCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    e.unionByName(
      e.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 10000)
        .withColumn("emb", expr("transform(emb, x -> x * 1.01)")))
  }

  /** q86: embedding-space decontamination — SEMANTIC leakage detection
    * between the corpus and a benchmark set (the `% 97` slice, q51's
    * convention), complementing q51's surface-form n-gram rule: a
    * paraphrased or re-encoded benchmark item shares no 8-gram but lands
    * in the same hyperplane bucket with near-1 cosine. Corpus vectors
    * probe the benchmark's sign-fingerprint buckets; exact decimal cosine
    * verifies inside the bucket; each probe keeps its best match (highest
    * cosine, ties to the lowest benchmark id) and flags ≥ 0.95.
    *
    * Scale shape: the benchmark stays benchmark-sized (thousands), so its
    * bucket table BROADCASTS — the corpus is never shuffled, and
    * per-probe candidates are bounded by the benchmark's bucket
    * occupancy, never by corpus hot buckets. One scan + one window on the
    * (tiny) hit set.
    */
  def q86EmbedDecontaminate(s: SparkSession, dir: String,
                            verify: String = "dec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isBench = col("vec_id") % 97 === 0 && col("vec_id") < 10000
    val all = embCorpus(s, dir)
      .withColumn("qemb", quantize(col("emb")))
      .withColumn("bucket", planeBucket(col("qemb")))
      .drop("qemb")
    val bench = all.filter(isBench)
      .select(col("vec_id").as("bench_id"), col("bucket"), col("emb").as("bemb"))
    // verify="dec" is the oracle gate (decimal-exact cosine); "float" is
    // the production kernel (native cosine_sim) on the identical plan —
    // the bench's x86 series prices the difference
    val cos =
      if (verify == "float") Num.roundD(cosine(col("emb"), col("bemb")))
      else cosineDec("emb", "bemb")
    val hits = all.filter(!isBench)
      .join(broadcast(bench), Seq("bucket"))
      .select(col("vec_id"), col("bench_id"), cos.as("cosine"))
    hits.withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("bench_id"))))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("is_contaminated", (col("cosine") >= 0.95).cast("int"))
      .orderBy("vec_id")
  }

  val q86Sql: String =
    s"""WITH $sqlFingerprintCte,
       |bench AS (
       |  SELECT vec_id AS bench_id, bucket FROM fp
       |  WHERE vec_id % 97 = 0 AND vec_id < 10000),
       |cand AS (
       |  SELECT f.vec_id AS id_a, b.bench_id AS id_b
       |  FROM fp f JOIN bench b USING (bucket)
       |  WHERE NOT (f.vec_id % 97 = 0 AND f.vec_id < 10000)),
       |${sqlPairCosine("cand")},
       |best AS (
       |  SELECT id_a, id_b, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rn
       |  FROM scored)
       |SELECT id_a AS vec_id, id_b AS bench_id, cosine,
       |  CAST(cosine >= 0.95 AS INT) AS is_contaminated
       |FROM best WHERE rn = 1
       |ORDER BY vec_id""".stripMargin

  /** q24: embedding-cosine near-dedup via sign-projection LSH. Vectors
    * sharing the full 16-bit sign fingerprint become candidates (a near-dup
    * agrees with its source on every plane w.h.p.); cosine is verified
    * inside the bucket only. Fingerprints are exact integer arithmetic
    * over quantized components ([[quantize]]/[[planeBucket]]) and the
    * verification cosine is decimal-exact ([[cosineDec]]), so the whole
    * pipeline — including the hot-bucket guard — carries a full DuckDB
    * value oracle (round 4; previously rows-only).
    */
  def q24DedupEmbedding(s: SparkSession, dir: String): DataFrame =
    embeddingPairs(embCorpus(s, dir))

  val q24Sql: String =
    s"""WITH $sqlFingerprintCte,
       |bann AS (
       |  SELECT vec_id, bucket,
       |    COUNT(*) OVER wb AS bucket_n,
       |    MIN(vec_id) OVER wb AS canon
       |  FROM fp
       |  WINDOW wb AS (PARTITION BY bucket)),
       |bpairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bann a JOIN bann b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE a.bucket_n <= ${Dedup.MaxBucket}
       |  UNION ALL
       |  SELECT canon AS id_a, vec_id AS id_b
       |  FROM bann WHERE bucket_n > ${Dedup.MaxBucket} AND vec_id <> canon),
       |${sqlPairCosine("bpairs")}
       |SELECT id_a AS vec_a, id_b AS vec_b, cosine FROM scored
       |WHERE cosine >= 0.9
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Embedding near-dup pairs over an arbitrary (vec_id, emb) frame — the
    * q24 body, parameterized for the injected-cluster guard test. Candidate
    * generation goes through [[Dedup.guardedPairs]]: a k-vector duplicate
    * cluster (identical embeddings ⇒ identical sign fingerprint ⇒ one
    * bucket) emits O(k) star edges to its canonical id, never O(k²) pairs.
    */
  def embeddingPairs(vecs: DataFrame): DataFrame = {
    // persisted in addition to guardedPairs' annotated cache: the 16
    // integer plane dots per row must not be recomputed if concurrent
    // branches race on a cold annotated cache — see q21. qemb is bound as
    // a column first so the quantization pass runs once, not 16×, even if
    // CollapseProject decides to inline cheap aliases.
    val e = vecs
      .withColumn("qemb", quantize(col("emb")))
      .withColumn("bucket", planeBucket(col("qemb")))
      .drop("qemb")
      .persist()
    Dedup.guardedPairs(e, "vec_id", Seq("bucket"), payloadCols = Seq("emb"))
      .select(
        col("id_a").as("vec_a"), col("id_b").as("vec_b"),
        cosineDec("a_emb", "b_emb").as("cosine"))
      .filter(col("cosine") >= 0.9)
      .orderBy("vec_a", "vec_b")
  }

  /** q25: exact brute-force cosine top-k — the correctness baseline
    * (query set: vec_id < 5, k = 10). The query side (with precomputed
    * norms) broadcasts; the corpus is scanned ONCE and each (query,
    * vector) pair evaluates its dot product in a single codegen'd
    * `aggregate(zip_with(...))` fold — no posexplode fan-out, no
    * |corpus|×dim shuffle (the round-3 shape exploded to 64× rows and
    * aggregated them back). The |Q|×|C| broadcast nested-loop product is the
    * honest plan for an exact baseline — every query must score every
    * vector by definition; the bucketed paths (q26/IVF) are the scale
    * path. Dot products and norms are decimal-exact (products of
    * float32 are exact in double; each product's DECIMAL(25,12)
    * rounding is engine-portable, and decimal addition is associative,
    * so the fold equals the oracle's unordered SUM bit-for-bit).
    */
  def q25AnnBruteforce(s: SparkSession, dir: String): DataFrame =
    q25AnnBruteforce(s, dir, 5)

  /** [[q25AnnBruteforce]] over the first `nQueries` query ids — the
    * exact baseline the ANN specs verify against (ADVICE r9: the PQ
    * paths serve 50-query sets, so their value checks need a baseline
    * over the SAME set, not q25's oracle-pinned 5).
    */
  def q25AnnBruteforce(s: SparkSession, dir: String, nQueries: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("qemb"))
      .withColumn("qn", dotDec("qemb", "qemb"))
    val n = e.select(col("vec_id").as("n_id"), col("emb").as("nemb"))
      .withColumn("nn", dotDec("nemb", "nemb"))
    val scored = n.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Num.roundD(dotDec("qemb", "nemb").cast("double") /
          sqrt(col("qn").cast("double") * col("nn").cast("double"))).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "n_id", "cosine")
      .orderBy("q_id", "rank")
  }

  val q25Sql: String = {
    val expl =
      """SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings""".stripMargin
    s"""WITH expl AS (
       |  $expl),
       |norms AS (
       |  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS norm2
       |  FROM expl GROUP BY vec_id),
       |dots AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |    SUM(CAST(q.v * n.v AS DECIMAL(25,12))) AS dotp
       |  FROM expl q JOIN expl n ON q.pos = n.pos AND q.vec_id < 5
       |    AND n.vec_id <> q.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.q_id, d.n_id,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(qn.norm2 AS DOUBLE) * CAST(nn.norm2 AS DOUBLE))")} AS cosine
       |  FROM dots d
       |  JOIN norms qn ON qn.vec_id = d.q_id
       |  JOIN norms nn ON nn.vec_id = d.n_id)
       |SELECT q_id, rank, n_id, cosine FROM (
       |  SELECT q_id, n_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  // --------------------------------------------------------------- q130

  /** q130: hard-negative mining — the retrieval-training composition of
    * the ANN and dedup families: per query, the top-k most-similar
    * vectors whose cosine is BELOW the near-duplicate threshold.
    * Contrastive training (DPR/Contriever-style) wants exactly these
    * rows as negatives: maximally confusable, but provably not the
    * positive itself — a near-dup leaking into the negative set is a
    * false negative that actively corrupts the loss, which is why the
    * excluded-dup count ships beside the ranking (n_dups_excluded > 0
    * is the audit signal that exclusion mattered). Runs on [[embCorpus]]
    * so planted re-encodes exercise the exclusion.
    *
    * Scale shape: q25's oracle-pinnable broadcast pattern at baseline
    * grain (queries broadcast, corpus never shuffled; the rank filter
    * group-limits); a production run swaps the candidate generator for
    * the standing semantic/IVF-PQ index probe (q97/q112) and keeps this
    * operator's threshold-split + rank stages unchanged — the
    * candidates-then-verify seam every ANN path here shares.
    */
  def q130HardNegatives(s: SparkSession, dir: String, eps: Double = 0.99,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embCorpus(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("qemb"))
      .withColumn("qn", dotDec("qemb", "qemb"))
    val n = e.select(col("vec_id").as("n_id"), col("emb").as("nemb"))
      .withColumn("nn", dotDec("nemb", "nemb"))
    // persisted: the dup count and the ranking both consume the
    // corpus-sized cosine pass — without the pin it would run twice
    // (the harness sweeps in-query pins between queries). Stays a LAZY
    // persist by round-17 A/B: the eager pin measured a hair slower
    // (0.95 vs 0.88 min-of-3) — this pass is small enough that the
    // barrier job costs more than the race it prevents.
    val scored = n.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Num.roundD(dotDec("qemb", "nemb").cast("double") /
          sqrt(col("qn").cast("double") * col("nn").cast("double"))).as("cosine"))
      .persist()
    val dups = scored.filter(col("cosine") >= eps)
      .groupBy("q_id").agg(count(lit(1)).as("n_dups_excluded"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.filter(col("cosine") < eps)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(broadcast(dups), Seq("q_id"), "left")
      .withColumn("n_dups_excluded", coalesce(col("n_dups_excluded"), lit(0L)))
      .select("q_id", "rank", "n_id", "cosine", "n_dups_excluded")
      .orderBy("q_id", "rank")
  }

  val q130Sql: String =
    s"""WITH ecorpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01)
       |  FROM embeddings WHERE vec_id % 5 = 0),
       |expl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
       |  FROM ecorpus),
       |norms AS (
       |  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS norm2
       |  FROM expl GROUP BY vec_id),
       |dots AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |    SUM(CAST(q.v * n.v AS DECIMAL(25,12))) AS dotp
       |  FROM expl q JOIN expl n ON q.pos = n.pos AND q.vec_id < 5
       |    AND n.vec_id <> q.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.q_id, d.n_id,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(qn.norm2 AS DOUBLE) * CAST(nn.norm2 AS DOUBLE))")} AS cosine
       |  FROM dots d
       |  JOIN norms qn ON qn.vec_id = d.q_id
       |  JOIN norms nn ON nn.vec_id = d.n_id),
       |dups AS (
       |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_dups_excluded
       |  FROM scored WHERE cosine >= 0.99 GROUP BY q_id),
       |neg AS (
       |  SELECT q_id, n_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, n_id) AS rank
       |  FROM scored WHERE cosine < 0.99)
       |SELECT neg.q_id, rank, n_id, cosine,
       |  COALESCE(n_dups_excluded, 0) AS n_dups_excluded
       |FROM neg LEFT JOIN dups ON dups.q_id = neg.q_id
       |WHERE rank <= 10
       |ORDER BY neg.q_id, rank""".stripMargin

  /** q130's PRODUCTION twin (round 12 — VERDICT r11 #4): hard-negative
    * mining over a STANDING index instead of the brute-force cross
    * product. The candidate generator is [[searchPqIndex]] (`family =
    * "pq"`, a [[refreshPqIndex]] table — sign or trained, the `_meta`
    * row routes it) or [[searchSemanticIndex]] (`family = "sem"`); the
    * threshold-split + rank seam is IDENTICAL to q130's: retrieved
    * candidates at cosine ≥ `eps` are excluded as near-dups and counted
    * in `n_dups_excluded` (the audit column — a near-dup leaking into
    * the negatives is a false negative that corrupts a contrastive
    * loss), the survivors re-rank, and the top-`k` per query ship.
    * `dupHeadroom` extra candidates are retrieved so excluding a
    * query's dups cannot starve its negative set.
    *
    * Differences from the oracle query, by construction: candidates
    * (and therefore the dup count) are those the index SURFACES —
    * recall is the index's nprobe/adcTopC trade (q98/pqRecallByIndex
    * price it), not 1.0; at 100 TB that trade is the point — per query
    * the scan touches nprobe cells' code rows instead of the corpus.
    * Self-matches are already excluded by the read paths. Shape: the
    * searches broadcast query-sized frames only (their serving guard),
    * the candidate frame is pinned once (|Q| × (k + dupHeadroom) rows)
    * so the dup rollup and the ranking share one index pass, and the
    * returned frame is batch-sized and eagerly pinned (the q112
    * in-query free discipline — the harnesses sweep result pins).
    */
  def mineHardNegatives(s: SparkSession, table: String, queries: DataFrame,
                        eps: Double = 0.99, k: Int = 10,
                        family: String = "pq", nprobe: Int = 3,
                        adcTopC: Int = 64, dupHeadroom: Int = 16): DataFrame = {
    val (res, pin) = mineHardNegativesLazy(s, table, queries, eps, k, family,
      nprobe, adcTopC, dupHeadroom)
    try res.localCheckpoint(true)
    finally pin.unpersist(false)
  }

  /** [[mineHardNegatives]] without the eager result pin — the lazy body
    * DedupAnnSpec plan-asserts (the q112Lazy pattern: a checkpointed
    * frame plans as a bare RDD scan). Returns (result, pinned
    * candidates).
    */
  private[graft] def mineHardNegativesLazy(s: SparkSession, table: String,
      queries: DataFrame, eps: Double, k: Int, family: String, nprobe: Int,
      adcTopC: Int, dupHeadroom: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val candK = k + dupHeadroom
    val cand = (family match {
      case "pq" => searchPqIndex(s, table, queries, candK, nprobe, adcTopC)
      case "sem" => searchSemanticIndex(s, table, queries, candK, nprobe)
      case other => throw new IllegalArgumentException(
        s"family must be pq or sem, got $other")
    }).persist()
    val dups = cand.filter(col("cosine") >= eps)
      .groupBy("q_id").agg(count(lit(1)).as("n_dups_excluded"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    val res = cand.filter(col("cosine") < eps)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(broadcast(dups), Seq("q_id"), "left")
      .withColumn("n_dups_excluded", coalesce(col("n_dups_excluded"), lit(0L)))
      .select("q_id", "rank", "n_id", "cosine", "n_dups_excluded")
      .orderBy("q_id", "rank")
    (res, cand)
  }

  // --------------------------------------------------------------- q137

  /** q137: contrastive training-pair assembly — the composition a
    * DPR/Contriever-style retrieval trainer actually consumes: per
    * anchor, its POSITIVE (the best corpus match at cosine ≥ eps — here
    * the planted re-encode; in production the near-dup cluster twin the
    * dedup ladder already found) paired with the top-k HARD NEGATIVES
    * below the threshold (q130's contract). Anchors with no positive
    * emit nothing — a contrastive example needs both sides, and an
    * anchor whose "positive" would be a chance sub-threshold match is a
    * label error, not a training row. One output row per (anchor,
    * negative): (q_id, pos_id, pos_cosine, rank, neg_id, neg_cosine).
    *
    * Scale shape: q130's oracle-pinnable broadcast pattern (anchors
    * broadcast, corpus never shuffles; ONE scored pass pinned and
    * consumed by both the positive argmax and the negative rank); the
    * production twin swaps the candidate generator for
    * [[mineHardNegatives]]/[[probePqIndex]] over the standing indexes —
    * the same candidates-then-split seam.
    */
  def q137ContrastivePairs(s: SparkSession, dir: String, eps: Double = 0.99,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embCorpus(s, dir)
    val q = e.filter(col("vec_id") < 25)
      .select(col("vec_id").as("q_id"), col("emb").as("qemb"))
      .withColumn("qn", dotDec("qemb", "qemb"))
    // corpus side rides the loader's CPU-spread (round 18): the
    // |corpus| × |q| cosine fold below runs one partition per core
    val n = e.select(col("vec_id").as("n_id"), col("emb").as("nemb"))
      .withColumn("nn", dotDec("nemb", "nemb"))
    // materialized EAGERLY (round 17, was a lazy persist): the positive
    // argmax feeds a broadcast build that races the negative ranking's
    // stages on a cold cache — each re-ran the corpus-sized decimal
    // cosine pass (the q98 measurement: 5.0 s → 3.8 s for the same
    // shape). Round 18 (VERDICT r17 #3): this frame is |corpus| × |q| —
    // unbounded — so the eager pin is now the SPILL-SAFE form
    // (Frames.eagerPersist: MEMORY_AND_DISK, lineage kept), not a
    // lineage-truncated localCheckpoint.
    val scored = graft.Frames.eagerPersist(n.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Num.roundD(dotDec("qemb", "nemb").cast("double") /
          sqrt(col("qn").cast("double") * col("nn").cast("double"))).as("cosine")))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    val pos = scored.filter(col("cosine") >= eps)
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") === 1)
      .select(col("q_id"), col("n_id").as("pos_id"),
        col("cosine").as("pos_cosine"))
    scored.filter(col("cosine") < eps)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(broadcast(pos), Seq("q_id")) // INNER: no positive, no pairs
      .select(col("q_id"), col("pos_id"), col("pos_cosine"), col("rank"),
        col("n_id").as("neg_id"), col("cosine").as("neg_cosine"))
      .orderBy("q_id", "rank")
  }

  val q137Sql: String =
    s"""WITH ecorpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01)
       |  FROM embeddings WHERE vec_id % 5 = 0),
       |expl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) AS pos, unnest(emb) AS v
       |  FROM ecorpus),
       |norms AS (
       |  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS norm2
       |  FROM expl GROUP BY vec_id),
       |dots AS (
       |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |    SUM(CAST(q.v * n.v AS DECIMAL(25,12))) AS dotp
       |  FROM expl q JOIN expl n ON q.pos = n.pos AND q.vec_id < 25
       |    AND n.vec_id <> q.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.q_id, d.n_id,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(qn.norm2 AS DOUBLE) * CAST(nn.norm2 AS DOUBLE))")} AS cosine
       |  FROM dots d
       |  JOIN norms qn ON qn.vec_id = d.q_id
       |  JOIN norms nn ON nn.vec_id = d.n_id),
       |pos AS (
       |  SELECT q_id, n_id AS pos_id, cosine AS pos_cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, n_id) AS pr
       |  FROM scored WHERE cosine >= 0.99),
       |neg AS (
       |  SELECT q_id, n_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, n_id) AS rank
       |  FROM scored WHERE cosine < 0.99)
       |SELECT neg.q_id, pos_id, pos_cosine, rank,
       |  n_id AS neg_id, cosine AS neg_cosine
       |FROM neg
       |JOIN (SELECT q_id, pos_id, pos_cosine FROM pos WHERE pr = 1) p
       |  ON p.q_id = neg.q_id
       |WHERE rank <= 5
       |ORDER BY neg.q_id, rank""".stripMargin

  // --------------------------------------------------------------- q144

  /** q144: kNN label propagation — semi-supervised labeling of the
    * embedding corpus from a small labeled seed set, the bootstrapping
    * move behind fastText-style quality classifiers and domain taggers:
    * a handful of curated labels (here the `vec_id % 97 == 0` slice and
    * the table's own `label` column) propagate to unlabeled vectors by
    * majority vote among each target's k nearest seeds (exact cosine,
    * ties at the k-boundary broken on seed id; vote ties on the smaller
    * label — both deterministic in both engines).
    *
    * Scale shape: the target set is bounded by contract (the caller
    * labels a batch at a time, here `vec_id < maxTargets`) and
    * BROADCAST against the streamed seed corpus, so nothing
    * corpus-sized shuffles until the k-bounded vote aggregate (≤ k rows
    * per target). This is the exact-baseline grain (the q25 discipline);
    * a production run at 100 TB swaps the candidate generator for the
    * standing-index probes ([[searchPqIndex]]/[[searchSemanticIndex]],
    * seeds as the indexed side) and keeps the vote stages unchanged —
    * the candidates-then-verify seam every ANN path here shares.
    * Cosines are decimal folds ([[dotDec]]) — engine-portable.
    */
  def q144LabelPropagation(s: SparkSession, dir: String, k: Int = 5,
      maxTargets: Int = 400): DataFrame = {
    val e = embeddings(s, dir)
    // seeds are the SMALL curated slice (~1% — a label set is expensive
    // to curate by definition); the target panel is bounded so the
    // exact-oracle cost stays linear in the seed count at any sf
    val seeds = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("s_id"), col("emb").as("semb"), col("label"))
    val targets = e.filter(col("vec_id") % 97 =!= 0 && col("vec_id") < maxTargets)
      .select(col("vec_id").as("t_id"), col("emb").as("temb"))
    labelPropagate(seeds, targets, k).orderBy("vec_id")
  }

  /** The production seam under [[q144LabelPropagation]]: propagate
    * labels from a `seeds` frame (`s_id`, `semb`, `label`) to a bounded
    * `targets` frame (`t_id`, `temb`) by majority vote among each
    * target's k nearest seeds. Targets broadcast; seeds stream.
    */
  def labelPropagate(seeds0: DataFrame, targets0: DataFrame,
      k: Int = 5): DataFrame = {
    val seeds = seeds0.withColumn("sn", dotDec("semb", "semb"))
    val targets = targets0.withColumn("tn", dotDec("temb", "temb"))
    val scored = seeds.crossJoin(broadcast(targets))
      .select(col("t_id"), col("s_id"), col("label"),
        Num.roundD(dotDec("temb", "semb").cast("double") /
          sqrt(col("tn").cast("double") * col("sn").cast("double"))).as("cosine"))
    voteOnScored(scored, k)
  }

  /** The vote stage shared by the exact and index-backed propagation
    * paths: rank each target's scored seeds, keep k, majority-vote the
    * label (vote ties on the smaller label).
    */
  private def voteOnScored(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nnW = Window.partitionBy("t_id").orderBy(col("cosine").desc, col("s_id"))
    val votes = scored
      .withColumn("nr", row_number().over(nnW))
      .filter(col("nr") <= k)
      .groupBy("t_id", "label")
      .agg(count(lit(1)).as("votes"), max("cosine").as("best_cosine"))
    val vw = Window.partitionBy("t_id").orderBy(col("votes").desc, col("label"))
    votes
      .withColumn("vr", row_number().over(vw))
      .filter(col("vr") === 1)
      .select(col("t_id").as("vec_id"), col("label").as("pred_label"),
        col("votes"), col("best_cosine"))
  }

  /** The index-backed production twin of [[labelPropagate]] — the 100 TB
    * shape: candidate neighbors come from a STANDING index's serving
    * path ([[searchPqIndex]]/[[searchSemanticIndex]] — nprobe cells per
    * target, never the corpus) and the vote stage is shared verbatim
    * with the exact path. `labels` maps index member ids to their
    * curated labels (`s_id`, `label`) and is broadcast — a label set is
    * small by definition; candidates without a label row are skipped
    * (the index may hold unlabeled members). Targets are a bounded
    * batch, per the serving paths' broadcast premise.
    */
  def propagateLabelsIndexed(s: SparkSession, table: String,
      targets: DataFrame, labels: DataFrame, k: Int = 5,
      family: String = "pq", nprobe: Int = 3, adcTopC: Int = 64): DataFrame = {
    val cand = family match {
      case "pq" => searchPqIndex(s, table, targets, k, nprobe, adcTopC)
      case "sem" => searchSemanticIndex(s, table, targets, k, nprobe)
      case other => throw new IllegalArgumentException(
        s"family must be pq or sem, got $other")
    }
    val scored = cand
      .select(col("q_id").as("t_id"), col("n_id").as("s_id"), col("cosine"))
      .join(broadcast(labels.select(col("s_id"), col("label"))), "s_id")
    voteOnScored(scored, k)
  }

  /** Multi-hop label propagation (round 15 — VERDICT r14 #6):
    * [[propagateLabelsIndexed]] is ONE hop, so a target whose k nearest
    * index members include no labeled member stays unlabeled even when
    * it sits one step beyond the labeled frontier (a target near a
    * target near a seed). Iterate: each round's adoptees join the label
    * set with confidence `decay × (their strongest same-label voter's
    * confidence)` — seeds carry 1.0, so a round-1 adoption reads
    * `decay`, a chain through it `decay²`, and a late DIRECT adoption
    * from an original seed still reads `decay` (the decay prices hops,
    * not rounds). Fixed `rounds` (never convergence-tested), the vote
    * kernel's deterministic tie rules unchanged, first label wins (an
    * adopted target never re-votes). The loop holds O(1) pinned frames
    * (the CC checkpoint-and-free discipline); the result is ONE eager
    * checkpoint the caller frees when done.
    *
    * Scale shape per round: one standing-index serving probe for the
    * still-unlabeled targets (nprobe cells each, never the corpus) +
    * k-bounded vote aggregates; the label set grows by adoptees only
    * and stays broadcast-sized by the same argument labels are.
    *
    * PRECONDITION for hops ≥ 2 (ADVICE r15): chains can only pass
    * through adoptees that are themselves STANDING-INDEX MEMBERS —
    * candidates come from the index's serving path, which returns
    * member ids only, so a round-1 adoptee that is not in the index can
    * never appear as a later round's voter. Targets drawn from the
    * index's own members (the spec's setup, and the natural day-2 shape
    * — "label the corpus the index already holds") chain fine;
    * out-of-index targets get exactly one hop. The fixed-point
    * short-circuit below bounds the cost either way: a round that
    * adopts NOTHING leaves both the label set and the pending set
    * unchanged, so every later round would replay it verbatim — the
    * loop stops instead of paying `rounds` identical index probes.
    */
  def propagateLabelsMultiHop(s: SparkSession, table: String,
      targets: DataFrame, labels: DataFrame, k: Int = 5, rounds: Int = 2,
      decay: Double = 0.5, family: String = "pq", nprobe: Int = 3,
      adcTopC: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(decay > 0.0 && decay <= 1.0,
      s"decay must be in (0, 1], got $decay")
    var labelSet = labels.select(col("s_id"), col("label"),
      lit(1.0).as("confidence")).localCheckpoint(true)
    var pending = targets.localCheckpoint(true)
    var acc: DataFrame = null
    var r = 1
    var fixedPoint = false
    while (r <= rounds && !fixedPoint) {
      val cand = family match {
        case "pq" => searchPqIndex(s, table, pending, k, nprobe, adcTopC)
        case "sem" => searchSemanticIndex(s, table, pending, k, nprobe)
        case other => throw new IllegalArgumentException(
          s"family must be pq or sem, got $other")
      }
      val scored = cand
        .select(col("q_id").as("t_id"), col("n_id").as("s_id"), col("cosine"))
        .join(broadcast(labelSet.select("s_id", "label", "confidence")), "s_id")
      val won = voteAdoptRound(scored, k, decay, r).localCheckpoint(true)
      val accNext =
        (if (acc == null) won else acc.unionByName(won)).localCheckpoint(true)
      if (acc != null) graft.Frames.freePinned(acc)
      acc = accNext
      if (won.isEmpty) {
        // zero adoptions = fixed point (see the doc comment): stop here
        // rather than re-probe the index for byte-identical rounds
        fixedPoint = true
        graft.Frames.freePinned(won)
      } else {
        val grown = labelSet.unionByName(
            won.select(col("vec_id").as("s_id"), col("pred_label").as("label"),
              col("confidence")))
          .localCheckpoint(true)
        graft.Frames.freePinned(labelSet)
        labelSet = grown
        val stillPending = pending
          .join(won.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .localCheckpoint(true)
        graft.Frames.freePinned(pending)
        pending = stillPending
        graft.Frames.freePinned(won) // folded into acc + labelSet + pending
      }
      r += 1
    }
    graft.Frames.freePinned(labelSet)
    graft.Frames.freePinned(pending)
    acc.orderBy("vec_id")
  }

  /** One multi-hop adoption round's vote over confidence-carrying
    * scored candidates (`t_id`, `s_id`, `cosine`, `label`,
    * `confidence`) — the [[voteOnScored]] tie rules with the hop decay:
    * an adoptee's confidence is `decay × its strongest same-label
    * voter's confidence`. Shared verbatim by the index-backed
    * ([[propagateLabelsMultiHop]]) and exact ([[labelPropagateMultiHopExact]])
    * paths so the two can never diverge.
    */
  private def voteAdoptRound(scored: DataFrame, k: Int, decay: Double,
                             r: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nnW = Window.partitionBy("t_id").orderBy(col("cosine").desc, col("s_id"))
    val votes = scored
      .withColumn("nr", row_number().over(nnW))
      .filter(col("nr") <= k)
      .groupBy("t_id", "label")
      .agg(count(lit(1)).as("votes"), max("cosine").as("best_cosine"),
        max("confidence").as("src_conf"))
    val vw = Window.partitionBy("t_id").orderBy(col("votes").desc, col("label"))
    votes
      .withColumn("vr", row_number().over(vw))
      .filter(col("vr") === 1)
      .select(col("t_id").as("vec_id"), col("label").as("pred_label"),
        col("votes"), col("best_cosine"),
        (lit(decay) * col("src_conf")).as("confidence"),
        lit(r).as("round"))
  }

  /** The EXACT multi-hop kernel — [[propagateLabelsMultiHop]] with the
    * candidate generator swapped for the exact cosine scan plus a
    * `minCosine` neighborhood floor (label spreading over the
    * ε-neighborhood graph): a target with no labeled neighbor at
    * cosine ≥ `minCosine` stays unlabeled this round and retries
    * against the grown label set next round. This is the oracle-shaped
    * twin (decimal cosine folds, every stage SQL-replayable); the
    * standing-index path restricts candidates by nprobe cells instead
    * of a cosine floor, and both share [[voteAdoptRound]] verbatim.
    * `seeds0`: (`s_id`, `semb`, `label`); `targets0`: (`t_id`, `temb`).
    */
  def labelPropagateMultiHopExact(seeds0: DataFrame, targets0: DataFrame,
      k: Int = 5, rounds: Int = 2, decay: Double = 0.5,
      minCosine: Double = 0.75): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(decay > 0.0 && decay <= 1.0, s"decay must be in (0, 1], got $decay")
    var labelSet = seeds0.select(col("s_id"), col("semb").as("emb"),
      col("label"), lit(1.0).as("confidence")).localCheckpoint(true)
    var pending = targets0.select(col("t_id"), col("temb"))
      .localCheckpoint(true)
    var acc: DataFrame = null
    var r = 1
    var fixedPoint = false
    while (r <= rounds && !fixedPoint) {
      val t = pending.withColumn("tn", dotDec("temb", "temb"))
      val l = labelSet.withColumn("sn", dotDec("emb", "emb"))
      val scored = l.crossJoin(broadcast(t))
        .filter(col("t_id") =!= col("s_id"))
        .select(col("t_id"), col("s_id"), col("label"), col("confidence"),
          Num.roundD(dotDec("temb", "emb").cast("double") /
            sqrt(col("tn").cast("double") * col("sn").cast("double")))
            .as("cosine"))
        .filter(col("cosine") >= minCosine)
      val won = voteAdoptRound(scored, k, decay, r).localCheckpoint(true)
      val accNext =
        (if (acc == null) won else acc.unionByName(won)).localCheckpoint(true)
      if (acc != null) graft.Frames.freePinned(acc)
      acc = accNext
      if (won.isEmpty) {
        // zero adoptions = fixed point (the index-backed path's rule:
        // label set and pending set unchanged → later rounds replay
        // this one verbatim) — stop instead of re-scoring
        fixedPoint = true
        graft.Frames.freePinned(won)
      } else {
        val adoptees = won
          .select(col("vec_id"), col("pred_label").as("label"), col("confidence"))
          .join(pending, col("vec_id") === col("t_id"))
          .select(col("vec_id").as("s_id"), col("temb").as("emb"),
            col("label"), col("confidence"))
        val grown = labelSet.unionByName(adoptees).localCheckpoint(true)
        graft.Frames.freePinned(labelSet)
        labelSet = grown
        val stillPending = pending
          .join(won.select(col("vec_id").as("t_id")), Seq("t_id"), "left_anti")
          .localCheckpoint(true)
        graft.Frames.freePinned(pending)
        pending = stillPending
        graft.Frames.freePinned(won)
      }
      r += 1
    }
    graft.Frames.freePinned(labelSet)
    graft.Frames.freePinned(pending)
    acc.orderBy("vec_id")
  }

  /** q151: multi-hop label propagation on PLANTED chain geometry — the
    * [[labelPropagateMultiHopExact]] kernel value-anchored the q141 way
    * (the truth is planted, so the oracle replays the whole event, not
    * just the shape): 12 disjoint 2-hop chains, each on its own pair of
    * basis dimensions (a = k, b = k + 12), with RATIONAL coordinates so
    * every cosine is an exact decimal both engines compute identically —
    * seed `e_a`, hop-1 target `0.8·e_a + 0.6·e_b` (cosine 0.8 to the
    * seed), hop-2 target `0.28·e_a + 0.96·e_b` (cosine 0.28 to the seed
    * — OUTSIDE the 0.75 neighborhood — but 0.8 to hop-1: the 3-4-5
    * triangle chain). Round 1 labels every hop-1 target at confidence
    * decay; round 2 labels every hop-2 target THROUGH its chain's
    * adoptee at decay² — the case one-hop propagation geometrically
    * cannot reach, now hash-checked against DuckDB.
    */
  def q151MultihopLabels(s: SparkSession, dir: String): DataFrame = {
    val ch = s.range(12).select(col("id").as("k"))
    val seeds = ch.select((col("k") + 1000L).as("s_id"),
      expr("transform(sequence(0, 63), j -> CAST(CASE WHEN j = k THEN 1.0 ELSE 0.0 END AS DOUBLE))").as("semb"),
      concat(lit("L"), col("k").cast("string")).as("label"))
    val t1 = ch.select((col("k") + 2000L).as("t_id"),
      expr("transform(sequence(0, 63), j -> CAST(CASE WHEN j = k THEN 0.8 WHEN j = k + 12 THEN 0.6 ELSE 0.0 END AS DOUBLE))").as("temb"))
    val t2 = ch.select((col("k") + 3000L).as("t_id"),
      expr("transform(sequence(0, 63), j -> CAST(CASE WHEN j = k THEN 0.28 WHEN j = k + 12 THEN 0.96 ELSE 0.0 END AS DOUBLE))").as("temb"))
    labelPropagateMultiHopExact(seeds, t1.unionByName(t2),
      k = 3, rounds = 2, decay = 0.5, minCosine = 0.75)
  }

  val q151Sql: String =
    s"""WITH ch AS (SELECT CAST(range AS BIGINT) AS k FROM range(12)),
       |expl AS (
       |  SELECT k + 1000 AS id, k AS j, CAST(1.0 AS DOUBLE) AS v FROM ch
       |  UNION ALL SELECT k + 2000, k, CAST(0.8 AS DOUBLE) FROM ch
       |  UNION ALL SELECT k + 2000, k + 12, CAST(0.6 AS DOUBLE) FROM ch
       |  UNION ALL SELECT k + 3000, k, CAST(0.28 AS DOUBLE) FROM ch
       |  UNION ALL SELECT k + 3000, k + 12, CAST(0.96 AS DOUBLE) FROM ch),
       |norms AS (
       |  SELECT id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2
       |  FROM expl GROUP BY 1),
       |labels AS (SELECT k + 1000 AS id, 'L' || CAST(k AS VARCHAR) AS label FROM ch),
       |-- every (target, other) cosine once; rounds slice it
       |dall AS (
       |  SELECT t.id AS t_id, s.id AS s_id,
       |    SUM(CAST(t.v * s.v AS DECIMAL(25,12))) AS dotp
       |  FROM expl t JOIN expl s ON t.j = s.j
       |    AND t.id >= 2000 AND s.id <> t.id
       |  GROUP BY 1, 2),
       |cos AS (
       |  SELECT d.t_id, d.s_id,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(tn.n2 AS DOUBLE) * CAST(sn.n2 AS DOUBLE))")} AS cosine
       |  FROM dall d
       |  JOIN norms tn ON tn.id = d.t_id
       |  JOIN norms sn ON sn.id = d.s_id),
       |-- round 1: label set = seeds at confidence 1.0
       |s1 AS (
       |  SELECT c.t_id, c.s_id, l.label, CAST(1.0 AS DOUBLE) AS confidence,
       |    c.cosine
       |  FROM cos c JOIN labels l ON l.id = c.s_id
       |  WHERE c.cosine >= 0.75),
       |v1 AS (
       |  SELECT t_id, label, COUNT(*) AS votes, MAX(cosine) AS best_cosine,
       |    MAX(confidence) AS src_conf
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
       |          ORDER BY cosine DESC, s_id) AS nr FROM s1) z
       |  WHERE nr <= 3 GROUP BY 1, 2),
       |won1 AS (
       |  SELECT t_id AS vec_id, label AS pred_label, votes, best_cosine,
       |    CAST(0.5 AS DOUBLE) * src_conf AS confidence, CAST(1 AS INT) AS round
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
       |          ORDER BY votes DESC, label) AS vr FROM v1) z
       |  WHERE vr = 1),
       |-- round 2: label set grows by round 1's adoptees at their decayed
       |-- confidence; pending = targets not yet labeled
       |ls2 AS (
       |  SELECT id, label, CAST(1.0 AS DOUBLE) AS confidence FROM labels
       |  UNION ALL
       |  SELECT vec_id, pred_label, confidence FROM won1),
       |s2 AS (
       |  SELECT c.t_id, c.s_id, l.label, l.confidence, c.cosine
       |  FROM cos c
       |  JOIN ls2 l ON l.id = c.s_id
       |  WHERE c.cosine >= 0.75
       |    AND c.t_id NOT IN (SELECT vec_id FROM won1)),
       |v2 AS (
       |  SELECT t_id, label, COUNT(*) AS votes, MAX(cosine) AS best_cosine,
       |    MAX(confidence) AS src_conf
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
       |          ORDER BY cosine DESC, s_id) AS nr FROM s2) z
       |  WHERE nr <= 3 GROUP BY 1, 2),
       |won2 AS (
       |  SELECT t_id AS vec_id, label AS pred_label, votes, best_cosine,
       |    CAST(0.5 AS DOUBLE) * src_conf AS confidence, CAST(2 AS INT) AS round
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
       |          ORDER BY votes DESC, label) AS vr FROM v2) z
       |  WHERE vr = 1)
       |SELECT * FROM (SELECT * FROM won1 UNION ALL SELECT * FROM won2)
       |ORDER BY vec_id""".stripMargin

  val q144Sql: String =
    s"""WITH expl AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       |    CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings),
       |norms AS (
       |  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS norm2
       |  FROM expl GROUP BY vec_id),
       |dots AS (
       |  SELECT t.vec_id AS t_id, s.vec_id AS s_id,
       |    SUM(CAST(t.v * s.v AS DECIMAL(25,12))) AS dotp
       |  FROM expl t JOIN expl s ON t.pos = s.pos
       |    AND t.vec_id % 97 <> 0 AND t.vec_id < 400 AND s.vec_id % 97 = 0
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.t_id, d.s_id, l.label,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(tn.norm2 AS DOUBLE) * CAST(sn.norm2 AS DOUBLE))")} AS cosine
       |  FROM dots d
       |  JOIN norms tn ON tn.vec_id = d.t_id
       |  JOIN norms sn ON sn.vec_id = d.s_id
       |  JOIN embeddings l ON l.vec_id = d.s_id),
       |topk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
       |    ORDER BY cosine DESC, s_id) AS nr
       |  FROM scored),
       |votes AS (
       |  SELECT t_id, label, COUNT(*) AS votes, MAX(cosine) AS best_cosine
       |  FROM topk WHERE nr <= 5 GROUP BY 1, 2),
       |win AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY t_id
       |    ORDER BY votes DESC, label) AS vr
       |  FROM votes)
       |SELECT t_id AS vec_id, label AS pred_label, votes, best_cosine
       |FROM win WHERE vr = 1
       |ORDER BY vec_id""".stripMargin

  /** IVF (inverted-file) ANN — the second scale path beside hyperplane
    * LSH: a k-means coarse quantizer partitions the corpus into `nlist`
    * cells; a query probes only its `nprobe` nearest cells. Centroids are
    * inherently tiny (nlist × dim) so they broadcast; the corpus is
    * touched once for assignment and candidates come from a cell-id
    * equi-join. Returns top-k per query.
    */
  def ivfTopK(s: SparkSession, dir: String, nlist: Int = 16, nprobe: Int = 4,
              k: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    val e = embCorpus(s, dir)
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(8)
      .fit(e.select(array_to_vector(col("emb")).as("features")))
    val centers: Seq[Seq[Double]] = model.clusterCenters.toSeq.map(_.toArray.toSeq)
    // cell assignment as a codegen'd argmax over cosine_sim against the
    // literal centroids — no UDF, index build is one corpus pass
    val sims = centers.map(c => cosine(col("emb"), typedLit(c)))
    val best = greatest(sims: _*)
    val cell = sims.zipWithIndex.foldRight(lit(-1): Column) {
      case ((sim, i), other) => when(sim === best, lit(i)).otherwise(other)
    }
    val assigned = e.select(col("vec_id"), col("emb"), cell.as("cell"))
      .persist() // corpus assignment reused by the probe join
    import s.implicits._
    val centroids = centers.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
    // each query probes its nprobe nearest cells
    val q = assigned.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val probeW = Window.partitionBy("q_id").orderBy(col("cdist"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("q_emb"), col("centroid")))
      .withColumn("cr", row_number().over(probeW))
      .filter(col("cr") <= nprobe)
      .select("q_id", "q_emb", "cell")
    val rankW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        Num.roundD(cosine(col("q_emb"), col("emb"))).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
      .orderBy("q_id", "rank")
  }

  /** q26: LSH-bucketed ANN — the scale path. The 16 hyperplane sign bits
    * are cut into 4 bands of 4 bits (the banding trick from MinHash-LSH
    * applied to hyperplane signatures): a query's candidates are the
    * vectors agreeing with it on at least one band, so each band join
    * touches ~n/16 of the corpus instead of all of it, and recall rises
    * with band count instead of multi-probe bit-flipping. Candidates are
    * deduped, cosine-verified, and top-k ranked per query — never a
    * corpus×corpus product (asserted by DedupAnnSpec/PlanSpec). Searches
    * [[embCorpus]]: LSH's contract is recall of genuinely-near vectors
    * (cosine ≈ 1 shares every sign band w.h.p.), which random base
    * vectors alone cannot exhibit.
    */
  def q26AnnLsh(s: SparkSession, dir: String): DataFrame =
    lshTopK(s, dir, maxQ = 50, k = 10).orderBy("q_id", "rank")

  /** The q26 body with the query set and k parameterized — queries are
    * independent, so a subset run returns the identical per-query rows
    * (q91's recall report scores the `maxQ = 5` slice).
    */
  private def lshTopK(s: SparkSession, dir: String, maxQ: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized EAGERLY (round 17, was lazy): the banded query side
    // feeds a broadcast build that races the corpus-side join stages on
    // a cold cache — each re-ran the 16-fold sign-fingerprint pass (the
    // q98/q137 shape). Round 18 (VERDICT r17 #3): the frame is the FULL
    // corpus, so the pin is now spill-safe (Frames.eagerPersist —
    // MEMORY_AND_DISK, lineage kept), and the fingerprint fold runs
    // CPU-spread (Tuning.spreadSmall) instead of as one scan task.
    val e = graft.Frames.eagerPersist(
      embCorpus(s, dir) // CPU-spread at the loader (round 18)
        .withColumn("qemb", quantize(col("emb")))
        .withColumn("bucket", planeBucket(col("qemb")))
        .drop("qemb"))
    def banded(df: DataFrame): DataFrame =
      df.select(col("*"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("bucket"), 4 * b).bitwiseAND(lit(0xF))): _*))
          .as(Seq("band_idx", "band_val")))
    val q = banded(e.filter(col("vec_id") < maxQ))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("band_idx"), col("band_val"))
    val cand = broadcast(q)
      .join(banded(e), Seq("band_idx", "band_val"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("q_emb"), col("emb"))
      .dropDuplicates("q_id", "n_id")
      .select(col("q_id"), col("n_id"),
        cosineDec("q_emb", "emb").as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
  }

  /** q91: ANN recall report — recall@k of the LSH-bucketed index (q26's
    * pipeline) against the exact brute-force baseline on a probe query
    * set, the accuracy metric an ANN deployment publishes beside its
    * latency (and the quantitative answer to "what does the banding
    * trade away?"). Per query: how many of the true top-k the index
    * returned. Both sides rank with the identical
    * (cosine desc, id) tie-break on identical 4dp decimal cosines, so
    * set membership — and therefore recall — is deterministic and the
    * DuckDB oracle replays it exactly.
    *
    * Scale shape: the exact side is the q25 plan (probe-set broadcast ×
    * one corpus pass — priced by the probe set's size, which is a QA
    * sample, not the workload); the index side is q26's banded bucket
    * join; the final compare joins two k-row-per-query frames on
    * (q_id, n_id). Run periodically over a fixed probe set, this is the
    * regression gate that catches index-parameter drift at 100 TB.
    */
  def q91AnnRecall(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embCorpus(s, dir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("qemb"))
      .withColumn("qn", dotDec("qemb", "qemb"))
    val n = e.select(col("vec_id").as("n_id"), col("emb").as("nemb"))
      .withColumn("nn", dotDec("nemb", "nemb"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    val exact = n.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Num.roundD(dotDec("qemb", "nemb").cast("double") /
          sqrt(col("qn").cast("double") * col("nn").cast("double"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id")
    val approx = lshTopK(s, dir, maxQ = 5, k = k)
      .select(col("q_id"), col("n_id"), lit(1).as("hit"))
    exact.join(approx, Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_found"))
      .withColumn("recall_at_k",
        Num.roundD(col("n_found").cast("double") / col("n_exact")))
      .select("q_id", "n_exact", "n_found", "recall_at_k")
      .orderBy("q_id")
  }

  val q91Sql: String =
    s"""WITH $sqlFingerprintCte,
       |bands AS (
       |  SELECT vec_id, bi AS band_idx, (bucket >> (4 * bi)) & 15 AS band_val
       |  FROM fp, range(0, 4) t(bi)),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS id_a, c.vec_id AS id_b
       |  FROM bands q JOIN bands c
       |    ON q.band_idx = c.band_idx AND q.band_val = c.band_val
       |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |${sqlPairCosine("cands")},
       |lsh AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |    FROM scored) t
       |  WHERE rank <= 10),
       |acands AS (
       |  SELECT q.vec_id AS id_a, c.vec_id AS id_b
       |  FROM ecorpus q JOIN ecorpus c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5),
       |${sqlPairCosine("acands", "e")},
       |exact AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |    FROM escored) t
       |  WHERE rank <= 10)
       |SELECT e.id_a AS q_id, COUNT(*) AS n_exact, COUNT(l.id_b) AS n_found,
       |  ${Num.sqlRoundD("CAST(COUNT(l.id_b) AS DOUBLE) / COUNT(*)")} AS recall_at_k
       |FROM exact e
       |LEFT JOIN lsh l ON l.id_a = e.id_a AND l.id_b = e.id_b
       |GROUP BY e.id_a
       |ORDER BY q_id""".stripMargin

  val q26Sql: String =
    s"""WITH $sqlFingerprintCte,
       |bands AS (
       |  SELECT vec_id, bi AS band_idx, (bucket >> (4 * bi)) & 15 AS band_val
       |  FROM fp, range(0, 4) t(bi)),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS id_a, c.vec_id AS id_b
       |  FROM bands q JOIN bands c
       |    ON q.band_idx = c.band_idx AND q.band_val = c.band_val
       |  WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
       |${sqlPairCosine("cands")}
       |SELECT id_a AS q_id, rank, id_b AS n_id, cosine FROM (
       |  SELECT id_a, id_b, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin

  /** q81: IVF ANN with a DETERMINISTIC coarse quantizer — the
    * oracle-pinnable twin of [[ivfTopK]]. The plan shape is identical
    * IVF (tiny broadcast centroid table, one corpus pass for cell
    * assignment, probe-cell equi-join, per-query top-k), but the
    * centroids are per-label decimal-exact component means instead of
    * k-means iterates: k-means' float accumulation order is
    * engine-specific, exact means are not, so DuckDB replays cell
    * assignment, probing, and verification bit-for-bit. At 100 TB the
    * labels stand in for any cheap pre-existing partition of the
    * corpus (a topic, a source shard, a previous clustering run) used
    * to seed cells; swap k-means back in ([[ivfTopK]]) when no such
    * partition exists and give up the value oracle for a recall test.
    *
    * nprobe = 3 of nlist = 10 cells; queries are the q25 query set, so
    * DedupAnnSpec can measure recall of this index against the exact
    * baseline.
    */
  def q81AnnIvf(s: SparkSession, dir: String, nprobe: Int = 3, k: Int = 10,
                verify: String = "decimal"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, dir) // CPU-spread at the loader (round 18)
    // nlist × Dim aggregate: decimal-exact component sums per label
    val centroids = e.groupBy(col("label").as("cell")).agg(
      array((0 until Dim).map { j =>
        (Num.exactSum(col("emb")(j)).cast("double") / count(lit(1))).cast("double")
      }: _*).as("centroid"))
      // integer-quantized centroid (the q24 discipline): cell RANKING only
      // needs cross-engine-identical ordering, and exact long dots give it
      // inside whole-stage codegen — the decimal fold (the first cut of
      // this query) measured 7.3 s at sf0.1 doing the same job
      .withColumn("qcent", expr(s"transform(centroid, x -> CAST(FLOOR(x * $QScale) AS BIGINT))"))
      .withColumn("cnorm2",
        expr("aggregate(zip_with(qcent, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
      // pinned (round 17 — guide §1.2): the corpus assignment and the
      // probe ranking each broadcast this nlist-row aggregate, and the
      // two broadcast exchanges build concurrently — unpinned, each
      // re-ran the corpus centroid pass
      .localCheckpoint(true)

    // cosine ORDER against a fixed vector = integer dot / sqrt(centroid
    // norm): the vector's own norm is constant inside each ranking
    // partition and drops out
    def qdot(a: String): Column = expr(
      s"CAST(aggregate(zip_with($a, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)")
    val simOf: Column => Column = qv => qv / sqrt(col("cnorm2").cast("double"))

    // one corpus pass: argmax over the 10 broadcast centroids, smallest
    // cell id on ties (the SQL mirror orders sim DESC, cell ASC)
    val withQ = e.withColumn("qemb",
      expr(s"transform(emb, x -> CAST(FLOOR(x * $QScale) AS BIGINT))"))
    val simW = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))
    val assigned = withQ.crossJoin(broadcast(centroids))
      .withColumn("sim", simOf(qdot("qemb")))
      .withColumn("rn", row_number().over(simW))
      .filter(col("rn") === 1)
      // per-vector decimal norm ONCE at assignment (the oracle's vnorm
      // CTE): cosineDec per candidate pair would refold BOTH norms for
      // every pair — 3 decimal folds per pair instead of 1
      .withColumn("n2", dotDec("emb", "emb").cast("double"))
      .select(col("vec_id"), col("emb"), col("cell"), col("n2"))

    // each query probes its nprobe nearest cells by the same metric
    val probeW = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
    val probes = withQ.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("qemb"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", simOf(qdot("qemb")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .withColumn("q_n2", dotDec("q_emb", "q_emb").cast("double"))
      .select("q_id", "q_emb", "cell", "q_n2")

    // verify = "decimal" is the oracle contract; "float" is the 100 TB
    // production choice (the fused native cosine_sim — same plan, no
    // DuckDB twin), published as the bench-only x81 series like the
    // dedup family's xxhash64 modes
    val verified: Column = verify match {
      case "decimal" => Num.roundD(dotDec("q_emb", "emb").cast("double")
        / sqrt(col("q_n2") * col("n2")))
      case "float" => Num.roundD(cosine(col("q_emb"), col("emb")))
      case other => throw new IllegalArgumentException(
        s"verify must be decimal or float, got $other")
    }
    val rankW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), verified.as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
      .orderBy("q_id", "rank")
  }

  val q81Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |expl AS (
       |  SELECT vec_id, label, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM e),
       |cent AS (
       |  SELECT label AS cell, j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq
       |  FROM expl GROUP BY 1, 2),
       |-- exact integer dot of every quantized vector against every
       |-- quantized centroid: ranking only, so the vector's own norm
       |-- (constant inside each ranking partition) drops out
       |vdots AS (
       |  SELECT x.vec_id, ct.cell,
       |    SUM(CAST(FLOOR(x.v * $QScale) AS BIGINT) * ct.cq) AS dvc
       |  FROM expl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |vnorm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2 FROM expl GROUP BY 1),
       |cnorm AS (SELECT cell, SUM(cq * cq) AS n2 FROM cent GROUP BY 1),
       |sims AS (
       |  SELECT d.vec_id, d.cell,
       |    CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE)) AS sim
       |  FROM vdots d JOIN cnorm c ON c.cell = d.cell),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
       |    FROM sims) t
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
       |    FROM sims WHERE vec_id < 50) t
       |  WHERE rn <= 3),
       |cands AS (
       |  SELECT DISTINCT p.q_id AS id_a, a.vec_id AS id_b
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.q_id),
       |pdots AS (
       |  SELECT c.id_a, c.id_b,
       |    SUM(CAST(qa.v * qb.v AS DECIMAL(25,12))) AS dotp
       |  FROM cands c
       |  JOIN expl qa ON qa.vec_id = c.id_a
       |  JOIN expl qb ON qb.vec_id = c.id_b AND qb.j = qa.j
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.id_a, d.id_b,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))")} AS cosine
       |  FROM pdots d
       |  JOIN vnorm na ON na.vec_id = d.id_a
       |  JOIN vnorm nb ON nb.vec_id = d.id_b)
       |SELECT id_a AS q_id, rank, id_b AS n_id, cosine FROM (
       |  SELECT id_a, id_b, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin

  /** The SemDeDup pipeline shared by q95 (per-document decision table)
    * and q96 (per-cluster report): deterministic cells, greedy
    * keep-low-centroid-similarity ordering, banded in-cell candidate
    * pairs, decimal-exact cosine verification.
    *
    * Returns (members, scored): `members(vec_id, cell, csim, pos)` —
    * every corpus vector with its cell, centroid similarity, and greedy
    * scan position; `scored(id_a, id_b, cosine)` — the verified in-cell
    * candidate pairs with pos_a < pos_b.
    */
  /** Deterministic "k-means" cells over a (vec_id, emb, label) frame:
    * per-label decimal-exact component means (q81's coarse quantizer),
    * integer-quantized for exact dots. One aggregation pass; the result
    * is nlist rows — always broadcast by consumers.
    *
    * `splits` (round 10) is the nlist scale knob: the standard IVF
    * discipline is nlist ∝ √N so probe candidate sets (nprobe/nlist of
    * the corpus) stay bounded as the corpus grows, and the label-seeded
    * quantizer freezes nlist at the label count. splits > 1 seeds
    * nlist = labels × splits cells deterministically — each seed group
    * is (label, xxhash64(vec_id) mod splits), its centroid the group's
    * decimal-exact mean — so a [[refreshPqIndex]] at a grown corpus
    * passes a larger `splits` and cells stay the same SIZE instead of
    * the same COUNT. Assignment stays pure argmax over the centroid
    * table (seeding never constrains membership), so every downstream
    * consumer is unchanged. A production k-means quantizer replaces the
    * seeding rule, not the lifecycle.
    */
  private def centroidTable(vecs: DataFrame): DataFrame =
    centroidTable(vecs, 1)

  /** nlist ∝ √N as arithmetic (VERDICT r10 #2): the `splits` a standing-
    * index REFRESH should use for a corpus of `nMembers` vectors whose
    * seed quantizer starts from `nLabels` label cells — the smallest
    * splits that brings nlist = labels × splits to at least √N, the
    * standard IVF sizing (probe work per query is nprobe/nlist of the
    * corpus ≈ nprobe·√N candidates when nlist tracks √N, instead of
    * growing linearly at fixed nlist — the PLANS.md round-10 measurement:
    * sf3 PQ screen 41.1 s at nlist 10 vs 22.3 s at 80). Deterministic
    * integer arithmetic so specs pin it at any corpus size.
    */
  private[graft] def autoSplits(nMembers: Long, nLabels: Long): Int = {
    val nlist = math.ceil(math.sqrt(math.max(nMembers, 1L).toDouble))
    math.max(1.0, math.ceil(nlist / math.max(nLabels, 1L).toDouble)).toInt
  }

  /** `splits ≤ 0` means AUTO: compute [[autoSplits]] from the refresh
    * input itself (one aggregate pass — the refresh already makes
    * several). An explicit positive `splits` remains the operator
    * override.
    */
  private def resolveSplits(index: DataFrame, splits: Int): Int =
    if (splits > 0) splits
    else {
      val r = index.agg(count(lit(1)), countDistinct(col("label"))).head()
      autoSplits(r.getLong(0), r.getLong(1))
    }

  private[graft] def centroidTable(vecs: DataFrame, splits: Int): DataFrame = {
    val seeded =
      if (splits <= 1) vecs.withColumn("seed_cell", col("label"))
      else vecs.withColumn("seed_cell", concat_ws("#",
        col("label").cast("string"),
        pmod(xxhash64(col("vec_id")), lit(splits)).cast("string")))
    centroidMeans(seeded, col("seed_cell"))
  }

  /** The centroid-table aggregate over any cell keying: decimal-exact
    * per-component means, integer-quantized — shared by the seeded
    * quantizer ([[centroidTable]]) and the Lloyd update
    * ([[centroidTableKmeans]], which regroups by the ASSIGNED cell).
    */
  private def centroidMeans(vecs: DataFrame, cellKey: Column): DataFrame =
    vecs.groupBy(cellKey.as("cell")).agg(
      array((0 until Dim).map { j =>
        (Num.exactSum(col("emb")(j)).cast("double") / count(lit(1))).cast("double")
      }: _*).as("centroid"))
      .withColumn("qcent", expr(s"transform(centroid, x -> CAST(FLOOR(x * $QScale) AS BIGINT))"))
      .withColumn("cnorm2", expr(
        "aggregate(zip_with(qcent, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
      .select("cell", "qcent", "cnorm2")

  /** TRAINED coarse quantizer (VERDICT r10 #1): spherical Lloyd's from
    * the deterministic seeding — `iters` rounds of (argmax-cosine
    * assignment against the current centroids → decimal-exact mean
    * update per assigned cell). No RNG anywhere: the init is
    * [[centroidTable]]'s seeded cells and every update is exact
    * arithmetic, so two refreshes of the same corpus train byte-equal
    * centroids. Cell IDs are the SEED ids throughout (members move
    * between rounds, names don't), so downstream partitioning and the
    * probe contract are unchanged. A cell that loses every member in a
    * round drops (nlist shrinks) — standard Lloyd behavior, harmless to
    * consumers that treat the table as the source of truth.
    *
    * Scale shape per round: one assignment pass (broadcast nlist-row
    * centroids, argmax per vector) + one partial-aggregated groupBy —
    * the [[centroidTable]] cost times `iters`. The nlist-row result is
    * eagerly pinned per round and the previous round's pin freed
    * (Frames.freePinned — the CC-loop discipline), so the loop holds
    * O(nlist) state regardless of `iters`.
    */
  private[operators] def centroidTableKmeans(vecs: DataFrame, splits: Int,
                                             iters: Int): DataFrame = {
    var cents = centroidTable(vecs, splits).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val next = centroidMeans(assignCellsLean(vecs, cents), col("cell"))
        .localCheckpoint(true)
      graft.Frames.freePinned(cents)
      cents = next
    }
    cents
  }

  /** Argmax cell assignment of `vecs` against a broadcast centroid
    * table, one pass: returns (vec_id, cell, csim, emb, bucket) with the
    * 16-bit sign fingerprint along for banding. csim is the full cosine
    * (exact-integer dot and norms, so the double is bit-identical
    * cross-engine) — the vector norm doesn't move the argmax but IS
    * needed to order DIFFERENT vectors inside one cell.
    */
  private[operators] def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame =
    assignCellsWith(vecs, centroids, banded = true)

  /** [[assignCells]] without the 16-plane sign fingerprint — the PQ
    * family's assignment (round 10): PQ cells need no band column, and
    * the fingerprint's 16 integer fold-dots per row are pure waste
    * there. Returns (vec_id, cell, csim, emb).
    */
  private def assignCellsLean(vecs: DataFrame, centroids: DataFrame): DataFrame =
    assignCellsWith(vecs, centroids, banded = false).drop("bucket")

  private def assignCellsWith(vecs: DataFrame, centroids: DataFrame,
                              banded: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = vecs
      .withColumn("qemb", quantize(col("emb")))
      .withColumn("bucket",
        if (banded) planeBucket(col("qemb")) else lit(0))
      // exact long self-dot of the quantized vector: the vector-norm leg
      // of the centroid similarity (cnorm2's discipline from q81)
      .withColumn("qn2", expr(
        "aggregate(zip_with(qemb, qemb, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
    val qdot = expr(
      "CAST(aggregate(zip_with(qemb, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)")
    val simW = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
    e.crossJoin(broadcast(centroids))
      .withColumn("csim",
        qdot / sqrt(col("cnorm2").cast("double") * col("qn2").cast("double")))
      .withColumn("rn", row_number().over(simW))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("csim"), col("emb"), col("bucket"))
  }

  private def semDedupFrames(vecs: DataFrame,
                             verify: String = "dec"): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val members = assignCells(vecs, centroidTable(vecs))
      // greedy scan order: LOW centroid similarity first (the paper's
      // keep-the-outlier policy), ties to the lower id
      .withColumn("pos", row_number().over(
        Window.partitionBy("cell").orderBy(col("csim").asc, col("vec_id"))))
      .persist()
    // in-cell candidates via the 4×4-bit sign bands (q26's banding): a
    // true semantic dup (cos ≈ 1) agrees on every band w.h.p., so recall
    // is preserved while in-cell pair density drops ~16× per band key —
    // the dense |cell|² similarity matrix of the reference recipe never
    // materializes. Pair generation goes through [[Dedup.guardedPairs]]
    // keyed on (cell, band) and ORDERED BY pos: a viral embedding (one
    // vector repeated k times — the empty-document embedding of a crawl
    // corpus — lands on one (cell, band) key in every band) emits O(k)
    // star edges from the group's FIRST-SCANNED member instead of O(k²)
    // pairs. For a hot group the greedy therefore degrades to "dropped
    // iff the group's first-scanned member matches at ≥ eps" — exact for
    // the identical-vector case that creates hot groups, and the same
    // bounded trade q24 documents for its buckets.
    val banded = members.select(
      col("cell"), col("vec_id"), col("pos"), col("emb"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("bucket"), 4 * b).bitwiseAND(lit(0xF))): _*))
        .as(Seq("band_idx", "band_val")))
    // verify="dec" is the oracle contract; "float" is the production
    // kernel on the identical plan (the q81/q86 convention — x95 prices
    // the decimal tax in the bench)
    val cos =
      if (verify == "float") Num.roundD(cosine(col("a_emb"), col("b_emb")))
      else cosineDec("a_emb", "b_emb")
    val scored = Dedup.guardedPairs(banded, "pos",
        Seq("cell", "band_idx", "band_val"), payloadCols = Seq("vec_id", "emb"))
      .dropDuplicates("a_vec_id", "b_vec_id")
      .select(col("a_vec_id").as("id_a"), col("b_vec_id").as("id_b"),
        cos.as("cosine"))
    (members, scored)
  }

  /** Shared oracle CTE chain replaying [[semDedupFrames]] on top of
    * [[sqlFingerprintCte]]'s `ecorpus`/`eexpl`/`fp`/`norms`: label
    * recovery for the re-encoded batch, per-label quantized centroids,
    * argmax cell assignment, greedy position, banded in-cell pairs,
    * decimal pair cosines (`sscored`).
    */
  private val sqlSemDedupCte: String =
    s"""$sqlFingerprintCte,
       |elab AS (
       |  SELECT e.vec_id, b.label FROM ecorpus e
       |  JOIN embeddings b ON b.vec_id = e.vec_id % 10000),
       |cent AS (
       |  SELECT l.label AS cell, x.j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(x.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq
       |  FROM eexpl x JOIN elab l ON l.vec_id = x.vec_id
       |  GROUP BY 1, 2),
       |cnorm AS (SELECT cell, SUM(cq * cq) AS n2 FROM cent GROUP BY 1),
       |qn AS (SELECT vec_id, SUM(q * q) AS qn2 FROM eexpl GROUP BY 1),
       |vdots AS (
       |  SELECT x.vec_id, ct.cell, SUM(x.q * ct.cq) AS dvc
       |  FROM eexpl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |csims AS (
       |  SELECT d.vec_id, d.cell,
       |    CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) AS csim
       |  FROM vdots d
       |  JOIN cnorm c ON c.cell = d.cell
       |  JOIN qn q ON q.vec_id = d.vec_id),
       |mem AS (
       |  SELECT vec_id, cell, csim,
       |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY csim ASC, vec_id) AS pos
       |  FROM (
       |    SELECT vec_id, cell, csim,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
       |    FROM csims) t
       |  WHERE rn = 1),
       |sband AS (
       |  SELECT m.vec_id, m.cell, m.pos, t.bi AS band_idx,
       |    (f.bucket >> (4 * t.bi)) & 15 AS band_val
       |  FROM mem m JOIN fp f ON f.vec_id = m.vec_id
       |  CROSS JOIN range(0, 4) t(bi)),
       |-- the hot-group guard (Dedup.guardedPairs keyed on (cell, band),
       |-- ordered by pos): small groups emit all ordered pairs, hot
       |-- groups star edges from the first-scanned member
       |sann AS (
       |  SELECT vec_id, cell, pos, band_idx, band_val,
       |    COUNT(*) OVER wg AS grp_n,
       |    MIN(pos) OVER wg AS canon_pos,
       |    FIRST_VALUE(vec_id) OVER
       |      (PARTITION BY cell, band_idx, band_val ORDER BY pos) AS canon_vec
       |  FROM sband
       |  WINDOW wg AS (PARTITION BY cell, band_idx, band_val)),
       |spairs AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |    FROM sann a JOIN sann b
       |      ON b.cell = a.cell AND b.band_idx = a.band_idx
       |      AND b.band_val = a.band_val AND a.pos < b.pos
       |    WHERE a.grp_n <= ${Dedup.MaxBucket}
       |    UNION ALL
       |    SELECT canon_vec AS id_a, vec_id AS id_b
       |    FROM sann WHERE grp_n > ${Dedup.MaxBucket} AND pos <> canon_pos) u),
       |${sqlPairCosine("spairs", "s")}""".stripMargin

  /** q95: SemDeDup — semantic deduplication by within-cluster embedding
    * similarity (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): cluster the corpus,
    * compare only within clusters, and among semantic duplicates keep
    * the item LEAST similar to its cluster centroid (the paper's
    * best-performing keep policy). Complements the surface-form family
    * (q21-q23: shared shingles) and q24 (full-fingerprint near-dup):
    * SemDeDup targets paraphrases and re-encodings that share no exact
    * n-gram, and its keep policy is centroid-aware rather than id-based.
    *
    * Determinism: cells are q81's deterministic coarse quantizer
    * (per-label decimal-exact means — at 100 TB any cheap existing
    * partition seeds cells; swap MLlib k-means in when none exists and
    * trade the value oracle for a recall test); the greedy order is
    * (centroid-sim ASC, vec_id); a vector is dropped iff some
    * earlier-scanned cellmate matches it at cosine ≥ eps — the
    * vectorized max-over-earlier-items semantics of the paper's released
    * implementation, which is join-expressible and needs no sequential
    * scan.
    *
    * Plan shape at 100 TB: centroids are a tiny broadcast (nlist rows);
    * assignment is one corpus pass; candidate pairs join on (cell, sign
    * band) so the |cell|² similarity matrix never materializes (nlist
    * scales with corpus size exactly as IVF's does, and the banding
    * bounds in-cell density independently); a viral repeated embedding
    * emits O(k) star edges through the shared [[Dedup.guardedPairs]]
    * hot-group guard instead of O(k²) pairs; verification is
    * decimal-exact cosine on candidates only. No corpus×corpus product
    * (PlanSpec-asserted).
    */
  def q95SemDedup(s: SparkSession, dir: String, eps: Double = 0.99,
                  verify: String = "dec"): DataFrame =
    semDedup(embCorpus(s, dir), eps, verify)

  /** The q95 body over an arbitrary (vec_id, emb, label) frame — the
    * library entry point (and the injected-hot-cluster guard test's):
    * per-vector decision table (vec_id, cell, centroid_sim, kept).
    */
  def semDedup(vecs: DataFrame, eps: Double = 0.99,
               verify: String = "dec"): DataFrame = {
    val (members, scored) = semDedupFrames(vecs, verify)
    val dropped = scored.filter(col("cosine") >= eps)
      .select(col("id_b")).distinct()
    members.join(dropped, members("vec_id") === dropped("id_b"), "left")
      .select(col("vec_id"), col("cell"),
        Num.roundD(col("csim")).as("centroid_sim"),
        col("id_b").isNull.cast("int").as("kept"))
      .orderBy("vec_id")
  }

  val q95Sql: String =
    s"""WITH $sqlSemDedupCte,
       |sdrops AS (SELECT DISTINCT id_b FROM sscored WHERE cosine >= 0.99)
       |SELECT m.vec_id, m.cell, ${Num.sqlRoundD("m.csim")} AS centroid_sim,
       |  CAST(d.id_b IS NULL AS INT) AS kept
       |FROM mem m LEFT JOIN sdrops d ON d.id_b = m.vec_id
       |ORDER BY m.vec_id""".stripMargin

  /** q96: the per-cluster SemDeDup report — the tuning artifact a
    * curation run publishes beside q95's decision table: per cell, the
    * member count, candidate pairs checked, verified duplicates at eps,
    * vectors dropped, and the drop rate. This is how an operator sizes
    * eps and nlist before committing a 100 TB dedup pass (q87's savings
    * report, lifted to the semantic family). Same pipeline as q95, so
    * the plan-shape guarantees carry over; the report itself is one
    * bounded groupBy over the (already candidate-bounded) pair set.
    */
  def q96SemDedupReport(s: SparkSession, dir: String, eps: Double = 0.99): DataFrame = {
    val (members, scored) = semDedupFrames(embCorpus(s, dir))
    val pairStats = scored
      .join(members.select(col("vec_id").as("id_b"), col("cell")), Seq("id_b"))
      .groupBy("cell").agg(
        count(lit(1)).as("pairs_checked"),
        count(when(col("cosine") >= eps, 1)).as("dup_pairs"),
        countDistinct(when(col("cosine") >= eps, col("id_b"))).as("n_dropped"))
    members.groupBy("cell").agg(count(lit(1)).as("n_members"))
      .join(pairStats, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("pairs_checked"), lit(0L)).as("pairs_checked"),
        coalesce(col("dup_pairs"), lit(0L)).as("dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        Num.roundD(coalesce(col("n_dropped"), lit(0L)).cast("double") /
          col("n_members").cast("double")).as("drop_rate"))
      .orderBy("cell")
  }

  val q96Sql: String =
    s"""WITH $sqlSemDedupCte,
       |pstat AS (
       |  SELECT m.cell,
       |    COUNT(*) AS pairs_checked,
       |    COUNT(CASE WHEN sc.cosine >= 0.99 THEN 1 END) AS dup_pairs,
       |    COUNT(DISTINCT CASE WHEN sc.cosine >= 0.99 THEN sc.id_b END) AS n_dropped
       |  FROM sscored sc JOIN mem m ON m.vec_id = sc.id_b
       |  GROUP BY 1)
       |SELECT m.cell, COUNT(*) AS n_members,
       |  COALESCE(MAX(p.pairs_checked), 0) AS pairs_checked,
       |  COALESCE(MAX(p.dup_pairs), 0) AS dup_pairs,
       |  COALESCE(MAX(p.n_dropped), 0) AS n_dropped,
       |  ${Num.sqlRoundD("CAST(COALESCE(MAX(p.n_dropped), 0) AS DOUBLE) / COUNT(*)")} AS drop_rate
       |FROM mem m LEFT JOIN pstat p ON p.cell = m.cell
       |GROUP BY m.cell
       |ORDER BY m.cell""".stripMargin

  /** q97: incremental semantic-dedup probe — the q83 move applied to the
    * embedding family: an ingest batch probes the STANDING corpus
    * structure (centroid cells + sign-band index) instead of re-running
    * SemDeDup over corpus∪batch. Each batch vector is assigned a cell by
    * the standing centroids, probes the index on (cell, band), and
    * reports its best match (highest cosine, ties to the lowest corpus
    * id) with an `is_dup` flag at eps — the admission decision a
    * streaming ingest makes per document before it ever joins the
    * corpus.
    *
    * The synthetic batch holds re-encodes (×0.99 — same direction,
    * cosine 1: must flag) and inversions (×−1 — cosine −1 to their
    * source: must pass) of deterministic corpus slices.
    *
    * Scale shape: centroids broadcast (nlist rows); the index side is
    * assigned + banded ONCE per refresh (materializable bucketed on the
    * probe keys exactly like [[Dedup.refreshIndex]] — only the
    * batch-side shuffles per probe, and a batch is small by definition);
    * hot index (cell, band) groups are probed through their canonical
    * member only ([[Dedup.guardedIndex]]'s asymmetric guard), so a viral
    * index bucket cannot multiply probe output. No corpus×corpus
    * product.
    */
  def q97SemProbe(s: SparkSession, dir: String, eps: Double = 0.99,
                  verify: String = "dec"): DataFrame = {
    val e = embeddings(s, dir)
    val batch = e.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 40000)
      .withColumn("emb", expr("transform(emb, x -> x * 0.99)"))
      .unionByName(
        e.filter(col("vec_id") % 11 === 0)
          .withColumn("vec_id", col("vec_id") + 50000)
          .withColumn("emb", expr("transform(emb, x -> -x)")))
    semProbe(e, batch, eps, verify)
  }

  /** The q97 body over arbitrary frames: `index` (vec_id, emb, label) is
    * the standing corpus, `batch` (vec_id, emb) the probe set. One row
    * per batch vector: (vec_id, cell, match_vec_id, cosine, is_dup),
    * null match for batch vectors colliding nowhere. Self-contained
    * composition of [[semanticIndexFrames]] + [[semProbeAgainst]]; a
    * production ingest materializes the index once with
    * [[refreshSemanticIndex]] and probes it with [[probeSemanticIndex]].
    */
  def semProbe(index: DataFrame, batch: DataFrame, eps: Double = 0.99,
               verify: String = "dec"): DataFrame = {
    val (centroids, guarded) = semanticIndexFrames(index)
    semProbeAgainst(guarded, centroids, batch, eps, verify)
  }

  /** The 4×4-bit sign bands of an [[assignCells]] output, one row per
    * (vector, band) — the candidate join key of the whole semantic
    * family (q95/q96 pair generation, q97's probe, the standing index).
    */
  private def bandedCells(assigned: DataFrame): DataFrame =
    assigned.select(
      col("vec_id"), col("cell"), col("emb"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("bucket"), 4 * b).bitwiseAND(lit(0xF))): _*))
        .as(Seq("band_idx", "band_val")))

  /** The STANDING semantic index as two frames — compute ONCE per
    * refresh, reuse across every probe:
    *   - `centroids(cell, qcent, cnorm2)`: the deterministic coarse
    *     quantizer, nlist rows — always broadcast by consumers (it is
    *     what assigns a batch vector its cell without touching the
    *     corpus);
    *   - `guarded(match_vec_id, cell, band_idx, band_val, i_emb)`: every
    *     corpus vector assigned + sign-banded, with
    *     [[Dedup.guardedIndex]]'s asymmetric hot-group guard applied —
    *     (cell, band) groups over [[Dedup.MaxBucket]] keep only their
    *     canonical (minimum-id) member, so a viral repeated embedding
    *     (the empty-document vector of a crawl corpus) can never
    *     multiply probe candidates.
    */
  def semanticIndexFrames(index: DataFrame): (DataFrame, DataFrame) = {
    // lazily persisted (round 17): the guarded assignment here and every
    // probe's batch assignment each broadcast this nlist-row aggregate —
    // once either broadcast lands it the corpus centroid pass runs once.
    // Lazy, not eager: a construction-time barrier job measured slower
    // than the duplicate pass it saves on this latency-bound profile.
    // PIN OWNERSHIP (ADVICE r17): the returned `centroids` frame IS the
    // pin — nlist rows, cacheManager-registered, swept by the harnesses'
    // between-run clearCache. A long-lived library consumer that builds
    // index generations repeatedly must `centroids.unpersist()` when a
    // generation retires, or the (small) pins accumulate for the
    // session's lifetime.
    val centroids = centroidTable(index).persist()
    (centroids, guardedFromAssigned(assignCells(index, centroids)))
  }

  /** The guarded member index over an [[assignCells]] output — the one
    * construction [[semanticIndexFrames]], [[appendSemanticIndex]] and
    * [[rebuildSemanticIndex]] all share: band every assigned vector and
    * apply [[Dedup.guardedIndex]]'s asymmetric hot-group guard per
    * (cell, band) key.
    */
  private def guardedFromAssigned(assigned: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wG = Window.partitionBy("cell", "band_idx", "band_val")
    bandedCells(assigned)
      .withColumn("grp_n", count(lit(1)).over(wG))
      .withColumn("canon", min(col("vec_id")).over(wG))
      .filter(col("grp_n") <= Dedup.MaxBucket || col("vec_id") === col("canon"))
      .select(col("vec_id").as("match_vec_id"), col("cell"),
        col("band_idx"), col("band_val"), col("emb").as("i_emb"))
  }

  /** Semantic-index refresh: materialize [[semanticIndexFrames]] as
    * managed tables — the q97 docstring's promised write, the embedding
    * twin of [[Dedup.refreshIndex]]. The guarded member index lands
    * bucketed on the probe's exact join keys (cell, band_idx, band_val),
    * so every later batch or stream probe's equi-join co-locates on the
    * bucket key with NO index-side exchange: the corpus is assigned,
    * banded, and guard-filtered once per refresh, and only the (small by
    * definition) probe batch ever shuffles. Two side tables land beside
    * it: `<table>_centroids` (nlist rows — the probe broadcasts it for
    * cell assignment) and `<table>_members` (the unguarded one-row-per-
    * member serving view, partitioned by cell, consumed by
    * [[searchSemanticIndex]]). The triple is the complete standing state
    * of the semantic-admission and semantic-serving paths.
    */
  def refreshSemanticIndex(index: DataFrame, table: String,
                           numBuckets: Int = 32, splits: Int = 0): Unit = {
    val s = index.sparkSession
    // reader-side snapshot isolation (round 14 — VERDICT r13 #2): the
    // refresh writes a complete NEW generation under versioned physical
    // names and atomically re-points the logical name only when every
    // table landed — a serving read that resolved the OLD generation
    // keeps its files untouched ([[graft.sources.TablePointer]]); the
    // previous generation retires one refresh later (the grace period)
    val phys = graft.sources.TablePointer.stage(s, table)
    // the same refresh-time nlist rule as [[refreshPqIndex]] (VERDICT
    // r10 #2): splits ≤ 0 computes [[autoSplits]] so cells keep their
    // SIZE as the corpus grows — the in-query twins (semProbe/q95/q97)
    // stay label-seeded (splits = 1) because their DuckDB oracles replay
    // that configuration; the standing index is the production shape.
    // The probe/append/rebuild contract is split-invariant: assignment
    // is argmax over whatever centroid table the refresh materialized.
    val centroids = centroidTable(index, resolveSplits(index, splits))
    val guarded = guardedFromAssigned(assignCells(index, centroids))
    graft.sources.Ingest.writeBucketed(guarded, phys, "cell", numBuckets,
      sortCol = None, moreBucketCols = Seq("band_idx", "band_val"))
    graft.sources.Ingest.clearStaleLocation(s, s"${phys}_centroids")
    centroids.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${phys}_centroids")
    // the SERVING view: one row per member, UNGUARDED (the hot-group
    // guard bounds dedup pair generation; a top-k search must see every
    // member), partitioned by cell so a broadcast nprobe-cell probe
    // prunes partitions at the scan (DPP) instead of reading the corpus
    graft.sources.Ingest.clearStaleLocation(s, s"${phys}_members")
    assignCells(index, centroids)
      .select(col("vec_id").as("member_id"), col("emb").as("m_emb"), col("cell"))
      .repartition(col("cell")) // one file per cell per write (compaction-trigger discipline)
      .write.mode("overwrite").format("parquet").partitionBy("cell")
      .saveAsTable(s"${phys}_members")
    // the COMMIT: one atomic pointer swap, then the grace-bounded retire
    graft.sources.TablePointer.swap(s, table, phys)
    graft.sources.TablePointer.retire(s, table, SemSuffixes)
  }

  /** The semantic family's companion-table suffixes (retire/drop). */
  private val SemSuffixes = Seq("_centroids", "_members")

  /** Incremental semantic-index maintenance: append an ADMITTED batch to
    * the standing [[refreshSemanticIndex]] table without re-assigning
    * the corpus — the embedding twin of [[Dedup.appendIndex]]. The batch
    * is assigned against the STANDING centroids (cells are defined at
    * refresh time and not moved by appends — the standard IVF
    * maintenance contract), banded, guard-filtered alone, and appended
    * under the table's bucket spec. Hot (cell, band) groups can grow
    * past the cap across appends until the next full refresh
    * re-tightens them; each append costs one batch-sized shuffle.
    */
  def appendSemanticIndex(s: SparkSession, table: String,
                          batch: DataFrame): Unit = {
    // appends mutate the CURRENT generation in place: they are additive
    // (no location is cleared) and serialized with every other writer by
    // the admission lock — only wholesale refreshes need a generation
    val t = graft.sources.TablePointer.resolve(s, table)
    val assigned = assignCells(batch, s.table(s"${t}_centroids")).persist()
    try {
      graft.sources.Ingest.appendBucketed(guardedFromAssigned(assigned), t, "cell",
        Seq("band_idx", "band_val"))
      assigned
        .select(col("vec_id").as("member_id"), col("emb").as("m_emb"), col("cell"))
        .repartition(col("cell")) // at most one new file per touched cell per append
        .write.mode("append").format("parquet").partitionBy("cell")
        .saveAsTable(s"${t}_members")
      // refresh through the PROBING session `s` (see Dedup.appendIndex):
      // the append frames' own session may be a different one when the
      // batch plan's left side came from outside a foreachBatch clone
      s.catalog.refreshTable(t)
      s.catalog.refreshTable(s"${t}_members")
    } finally assigned.unpersist()
  }

  /** Rebuild the guarded index + members serving view of a standing
    * [[refreshSemanticIndex]] table from `vecs` alone, KEEPING the
    * existing centroid table — the crash-recovery write
    * ([[graft.Admit]]'s WAL repair): cells are defined at refresh time
    * and must not move under a repair, and the rebuild source (seed ∪
    * landed admissions) carries no label column to re-seed a quantizer
    * from. Orphan appends — index rows whose batch's landing never
    * committed — vanish because both writes are overwrites derived from
    * `vecs` alone; the bucket spec is read from the catalog so the
    * rebuilt table keeps its probe co-location contract.
    */
  def rebuildSemanticIndex(s: SparkSession, table: String, vecs: DataFrame): Unit = {
    // the crash-repair rewrite targets the CURRENT generation (it runs
    // under the admission lock; centroids must not move, so there is no
    // complete new generation to stage — the declared in-place residual)
    val t = graft.sources.TablePointer.resolve(s, table)
    val numBuckets = s.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    val assigned = assignCells(vecs, s.table(s"${t}_centroids")).persist()
    try {
      graft.sources.Ingest.writeBucketed(guardedFromAssigned(assigned), t,
        "cell", numBuckets, sortCol = None,
        moreBucketCols = Seq("band_idx", "band_val"))
      graft.sources.Ingest.clearStaleLocation(s, s"${t}_members")
      assigned
        .select(col("vec_id").as("member_id"), col("emb").as("m_emb"), col("cell"))
        .repartition(col("cell")) // one file per cell per write (compaction-trigger discipline)
        .write.mode("overwrite").format("parquet").partitionBy("cell")
        .saveAsTable(s"${t}_members")
      s.catalog.refreshTable(t)
      s.catalog.refreshTable(s"${t}_members")
    } finally assigned.unpersist()
  }

  /** Intra-batch semantic twins: batch vectors matching an EARLIER
    * (lower-id) vector of the SAME batch at cosine ≥ eps — the screen
    * [[graft.Admit]] runs BEFORE the standing-index probes, so two
    * re-encodes of one novel document arriving together are not both
    * admitted (ADVICE r8). Cells come from the STANDING broadcast
    * centroids (an admission batch has no label column to seed its own
    * quantizer, and sharing the standing cells makes the intra screen
    * consistent with the standing probe); candidates are the in-cell
    * sign-band self-join through [[Dedup.guardedPairs]] (cache=false —
    * this runs per micro-batch on an unbounded stream), so a viral
    * repeated vector emits O(k) star edges, never O(k²) pairs. Returns
    * distinct dropped (vec_id) rows.
    */
  def semIntraDups(centroids: DataFrame, batch: DataFrame, eps: Double = 0.99,
                   verify: String = "float"): DataFrame = {
    val banded = bandedCells(assignCells(batch, centroids))
    val cos =
      if (verify == "float") Num.roundD(cosine(col("a_emb"), col("b_emb")))
      else cosineDec("a_emb", "b_emb")
    Dedup.guardedPairs(banded, "vec_id", Seq("cell", "band_idx", "band_val"),
        payloadCols = Seq("emb"), cache = false)
      .dropDuplicates("id_a", "id_b")
      .filter(cos >= eps)
      .select(col("id_b").as("vec_id")).distinct()
  }

  /** Probe a batch against a [[refreshSemanticIndex]]-materialized index
    * — [[semProbeAgainst]] over the bucketed scan and its centroid
    * side-table.
    */
  def probeSemanticIndex(s: SparkSession, table: String, batch: DataFrame,
                         eps: Double = 0.99, verify: String = "dec",
                         cache: Boolean = true): DataFrame = {
    // one resolution per probe plan (the TablePointer reader contract)
    val t = graft.sources.TablePointer.resolve(s, table)
    semProbeAgainst(s.table(t), s.table(s"${t}_centroids"),
      batch, eps, verify, cache)
  }

  /** Top-k cosine SEARCH against a [[refreshSemanticIndex]] table — the
    * serving path of the materialized index (the dedup probe asks "is
    * this a near-dup?"; this asks "what are the k nearest neighbors?").
    * IVF shape over the standing state: each query is assigned its
    * `nprobe` nearest cells by the broadcast centroid table, candidates
    * come from those cells' members, the fused native cosine ranks them,
    * and a per-query window keeps the top k (ties to the lower id).
    *
    * Candidates come from the `<table>_members` serving view (one row
    * per member, UNGUARDED — the hot-group guard bounds dedup pair
    * generation, a search must see every member), which the refresh
    * writes partitioned by cell. The query set BROADCASTS — a serving
    * batch is small by definition — so the member side is a pure scan
    * with no exchange, and the broadcast join's cell keys prune the
    * partitioned scan (DPP): probing 3 of nlist cells reads 3 cells'
    * files, not the corpus.
    *
    * Load-shape guard (VERDICT r8 #7): the broadcast is the plan's
    * premise, so a corpus-sized query frame must fail LOUDLY here — a
    * silent attempt would OOM the driver mid-broadcast. Over
    * `maxQueryRows` the call aborts naming the bulk paths
    * ([[probeSemanticIndex]]/[[semProbeAgainst]], whose bucketed
    * equi-join shuffles only the batch and never broadcasts vectors);
    * the count itself is one cheap aggregation over the query frame.
    */
  def searchSemanticIndex(s: SparkSession, table: String, queries: DataFrame,
                          k: Int = 10, nprobe: Int = 3,
                          maxQueryRows: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nQ = queries.count()
    require(nQ <= maxQueryRows,
      s"searchSemanticIndex broadcasts its query set, and $nQ query rows " +
        s"exceed maxQueryRows=$maxQueryRows — this is a serving path for " +
        "small probe batches. For corpus-sized probes use the bucketed " +
        "dedup probe (Ann.probeSemanticIndex / Ann.semProbeAgainst), " +
        "which shuffles only the batch side, or raise maxQueryRows " +
        "deliberately.")
    // resolve the CURRENT generation once — the whole plan binds to one
    // consistent (centroids, members) pair, and a refresh landing mid-
    // query cannot pull this reader's files out from under it
    val t = graft.sources.TablePointer.resolve(s, table)
    val centroids = s.table(s"${t}_centroids")
    val probeW = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
    val qe = queries
      .withColumn("qemb", quantize(col("emb")))
      .withColumn("qn2", expr(
        "aggregate(zip_with(qemb, qemb, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
    val qdot = expr(
      "CAST(aggregate(zip_with(qemb, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)")
    val probes = qe.crossJoin(broadcast(centroids))
      .withColumn("csim",
        qdot / sqrt(col("cnorm2").cast("double") * col("qn2").cast("double")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("cell"))
    val members = s.table(s"${t}_members")
      .select(col("member_id").as("n_id"), col("cell"), col("m_emb"))
    val rankW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    broadcast(probes).join(members, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        Num.roundD(cosine(col("q_emb"), col("m_emb"))).as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "n_id", "cosine")
      .orderBy("q_id", "rank")
  }

  /** The probe tail against a PREPARED index: assign each batch vector a
    * cell via the broadcast centroids, band it, equi-join the guarded
    * member index on (cell, band_idx, band_val), verify candidates, and
    * keep each batch vector's best match (highest cosine, ties to the
    * lowest corpus id). `cache = false` skips persisting the batch
    * assignment — the streaming micro-batch setting
    * ([[graft.streaming.EventStreams.semAdmissionQuery]]), where a
    * per-batch persist would leak cached partitions across an unbounded
    * run; the assignment is then computed twice (banding + final join),
    * a bounded recompute of a one-pass projection over a small batch.
    */
  def semProbeAgainst(guarded: DataFrame, centroids: DataFrame,
                      batch: DataFrame, eps: Double = 0.99,
                      verify: String = "dec",
                      cache: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bAssigned = {
      val a = assignCells(batch, centroids)
      if (cache) a.persist() else a
    }
    val bb = bandedCells(bAssigned)
      .select(col("vec_id"), col("cell"), col("band_idx"), col("band_val"),
        col("emb").as("b_emb"))
    val cos =
      if (verify == "float") Num.roundD(cosine(col("b_emb"), col("i_emb")))
      else cosineDec("b_emb", "i_emb")
    val cand = bb.join(guarded, Seq("cell", "band_idx", "band_val"))
      .select(col("vec_id"), col("match_vec_id"), col("b_emb"), col("i_emb"))
      .dropDuplicates("vec_id", "match_vec_id")
      .select(col("vec_id"), col("match_vec_id"), cos.as("cosine"))
    val w = Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("match_vec_id"))
    val best = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    bAssigned.select(col("vec_id"), col("cell"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("match_vec_id"), col("cosine"),
        when(col("cosine") >= eps, 1).otherwise(0).as("is_dup"))
      .orderBy("vec_id")
  }

  /** q98: the complete ANN accuracy artifact — q91's recall report
    * extended to cover BOTH index types against ONE shared exact
    * baseline: per (index_type, query), how many of the true top-k the
    * index returned. The `lsh` leg is q26's sign-band bucket join; the
    * `ivf` leg is q81's deterministic coarse quantizer lifted to the
    * probed corpus (label-seeded decimal-exact centroids, argmax cell
    * assignment, top-nprobe probe cells per query). One report row set
    * per index type makes the recall/latency trade directly legible —
    * the artifact an ANN deployment publishes when CHOOSING its index,
    * not just monitoring one.
    *
    * Scale shape: the exact side is one probe-broadcast corpus pass
    * (probe set is a QA sample); each index leg is its own family's
    * candidate join (bounded by band density resp. nprobe cell
    * occupancy); the recall compare joins k-row-per-query frames. All
    * ranking uses the (cosine desc, id) tie-break on 4dp decimal
    * cosines, so recall is deterministic and DuckDB replays it.
    */
  def q98AnnRecallByIndex(s: SparkSession, dir: String, k: Int = 10,
                          nprobe: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embCorpus(s, dir)
    // shared exact baseline (q91's): probe broadcast × one corpus pass
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("qemb"))
      .withColumn("qn", dotDec("qemb", "qemb"))
    val n = e.select(col("vec_id").as("n_id"), col("emb").as("nemb"))
      .withColumn("nn", dotDec("nemb", "nemb"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    val exact = n.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Num.roundD(dotDec("qemb", "nemb").cast("double") /
          sqrt(col("qn").cast("double") * col("nn").cast("double"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id")
      // pinned eagerly (round 17, was a lazy persist): both recall legs
      // consume it and their stages schedule concurrently — racing a
      // cold cache, each re-ran the exact-baseline corpus pass
      .localCheckpoint(true)

    def recallOf(indexType: String, approx: DataFrame): DataFrame =
      exact.join(approx.select(col("q_id"), col("n_id"), lit(1).as("hit")),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_found"))
        .withColumn("recall_at_k",
          Num.roundD(col("n_found").cast("double") / col("n_exact")))
        .select(lit(indexType).as("index_type"), col("q_id"),
          col("n_exact"), col("n_found"), col("recall_at_k"))

    // lsh leg: q26's banded bucket join, restricted to the probe set
    val lsh = lshTopK(s, dir, maxQ = 5, k = k).select("q_id", "n_id")

    // ivf leg over the SAME corpus: label-seeded cells (re-encodes carry
    // their source's label), argmax assignment for the corpus, the
    // top-nprobe cells per probe query, candidates by cell equi-join.
    // Pinned (round 17 — the q81 rule): probes + corpus assignment each
    // broadcast the nlist-row aggregate
    val centroids = centroidTable(e).localCheckpoint(true)
    val probes = {
      val pe = e.filter(col("vec_id") < 5)
        .withColumn("qemb", quantize(col("emb")))
        .withColumn("qn2", expr(
          "aggregate(zip_with(qemb, qemb, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
      val qdot = expr(
        "CAST(aggregate(zip_with(qemb, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)")
      val wp = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
      pe.crossJoin(broadcast(centroids))
        .withColumn("csim",
          qdot / sqrt(col("cnorm2").cast("double") * col("qn2").cast("double")))
        .withColumn("rn", row_number().over(wp))
        .filter(col("rn") <= nprobe)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("cell"))
    }
    val corpusCells = assignCells(e, centroids)
      .select(col("vec_id").as("n_id"), col("cell"), col("emb").as("n_emb"))
    val rankW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    val ivf = broadcast(probes).join(corpusCells, Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosineDec("q_emb", "n_emb").as("cosine"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("q_id", "n_id")

    recallOf("ivf", ivf).unionByName(recallOf("lsh", lsh))
      .orderBy("index_type", "q_id")
  }

  val q98Sql: String =
    s"""WITH $sqlSemDedupCte,
       |acands AS (
       |  SELECT q.vec_id AS id_a, c.vec_id AS id_b
       |  FROM ecorpus q JOIN ecorpus c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 5),
       |${sqlPairCosine("acands", "e")},
       |exact AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |    FROM escored) t
       |  WHERE rank <= 10),
       |bands AS (
       |  SELECT vec_id, bi AS band_idx, (bucket >> (4 * bi)) & 15 AS band_val
       |  FROM fp, range(0, 4) t(bi)),
       |lcands AS (
       |  SELECT DISTINCT q.vec_id AS id_a, c.vec_id AS id_b
       |  FROM bands q JOIN bands c
       |    ON q.band_idx = c.band_idx AND q.band_val = c.band_val
       |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |${sqlPairCosine("lcands", "l")},
       |lsh AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |    FROM lscored) t
       |  WHERE rank <= 10),
       |-- ivf leg: csims/mem are the SemDeDup chain's assignment CTEs —
       |-- the identical deterministic coarse quantizer over ecorpus
       |iprobe AS (
       |  SELECT vec_id AS q_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
       |    FROM csims WHERE vec_id < 5) t
       |  WHERE rn <= 3),
       |icands AS (
       |  SELECT p.q_id AS id_a, m.vec_id AS id_b
       |  FROM iprobe p JOIN mem m ON m.cell = p.cell
       |  WHERE m.vec_id <> p.q_id),
       |${sqlPairCosine("icands", "i")},
       |ivf AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rank
       |    FROM iscored) t
       |  WHERE rank <= 10)
       |SELECT * FROM (
       |  SELECT 'ivf' AS index_type, e.id_a AS q_id, COUNT(*) AS n_exact,
       |    COUNT(i.id_b) AS n_found,
       |    ${Num.sqlRoundD("CAST(COUNT(i.id_b) AS DOUBLE) / COUNT(*)")} AS recall_at_k
       |  FROM exact e LEFT JOIN ivf i ON i.id_a = e.id_a AND i.id_b = e.id_b
       |  GROUP BY e.id_a
       |  UNION ALL
       |  SELECT 'lsh', e.id_a, COUNT(*), COUNT(l.id_b),
       |    ${Num.sqlRoundD("CAST(COUNT(l.id_b) AS DOUBLE) / COUNT(*)")}
       |  FROM exact e LEFT JOIN lsh l ON l.id_a = e.id_a AND l.id_b = e.id_b
       |  GROUP BY e.id_a)
       |ORDER BY index_type, q_id""".stripMargin

  val q97Sql: String =
    s"""WITH ie AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |be AS (
       |  SELECT vec_id + 40000 AS vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.99) AS emb
       |  FROM embeddings WHERE vec_id % 7 = 0
       |  UNION ALL
       |  SELECT vec_id + 50000,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) * -1.0)
       |  FROM embeddings WHERE vec_id % 11 = 0),
       |allv AS (
       |  SELECT vec_id, emb FROM ie
       |  UNION ALL SELECT vec_id, emb FROM be),
       |eexpl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v,
       |    CAST(FLOOR(unnest(emb) * $QScale) AS BIGINT) AS q
       |  FROM allv),
       |$sqlPlanesCte,
       |pdot AS (
       |  SELECT e.vec_id, p.i, SUM(e.q * p.s) AS dot
       |  FROM eexpl e JOIN planes p ON e.j = p.j
       |  GROUP BY 1, 2),
       |fp AS (
       |  SELECT vec_id,
       |    CAST(SUM(CASE WHEN dot >= 0 THEN 1 << i ELSE 0 END) AS INT) AS bucket
       |  FROM pdot GROUP BY 1),
       |norms AS (
       |  SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2
       |  FROM eexpl GROUP BY 1),
       |qn AS (SELECT vec_id, SUM(q * q) AS qn2 FROM eexpl GROUP BY 1),
       |cent AS (
       |  SELECT l.label AS cell, x.j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(x.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq
       |  FROM eexpl x JOIN ie l ON l.vec_id = x.vec_id
       |  GROUP BY 1, 2),
       |cnorm AS (SELECT cell, SUM(cq * cq) AS n2 FROM cent GROUP BY 1),
       |vdots AS (
       |  SELECT x.vec_id, ct.cell, SUM(x.q * ct.cq) AS dvc
       |  FROM eexpl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |csims AS (
       |  SELECT d.vec_id, d.cell,
       |    CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) AS csim
       |  FROM vdots d
       |  JOIN cnorm c ON c.cell = d.cell
       |  JOIN qn q ON q.vec_id = d.vec_id),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
       |    FROM csims) t
       |  WHERE rn = 1),
       |iband AS (
       |  SELECT a.vec_id, a.cell, t.bi AS band_idx,
       |    (f.bucket >> (4 * t.bi)) & 15 AS band_val
       |  FROM asg a JOIN fp f ON f.vec_id = a.vec_id
       |  CROSS JOIN range(0, 4) t(bi)
       |  WHERE a.vec_id < 40000),
       |-- the asymmetric hot-group guard: over-cap index groups keep only
       |-- their canonical member
       |idx AS (
       |  SELECT vec_id, cell, band_idx, band_val FROM (
       |    SELECT vec_id, cell, band_idx, band_val,
       |      COUNT(*) OVER wg AS grp_n, MIN(vec_id) OVER wg AS canon
       |    FROM iband
       |    WINDOW wg AS (PARTITION BY cell, band_idx, band_val)) g
       |  WHERE grp_n <= ${Dedup.MaxBucket} OR vec_id = canon),
       |bband AS (
       |  SELECT a.vec_id, a.cell, t.bi AS band_idx,
       |    (f.bucket >> (4 * t.bi)) & 15 AS band_val
       |  FROM asg a JOIN fp f ON f.vec_id = a.vec_id
       |  CROSS JOIN range(0, 4) t(bi)
       |  WHERE a.vec_id >= 40000),
       |cand AS (
       |  SELECT DISTINCT b.vec_id AS id_a, i.vec_id AS id_b
       |  FROM bband b JOIN idx i
       |    ON i.cell = b.cell AND i.band_idx = b.band_idx
       |    AND i.band_val = b.band_val),
       |${sqlPairCosine("cand")},
       |best AS (
       |  SELECT id_a, id_b, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rn
       |  FROM scored)
       |SELECT b.vec_id, b.cell, t.id_b AS match_vec_id, t.cosine,
       |  CASE WHEN t.cosine >= 0.99 THEN 1 ELSE 0 END AS is_dup
       |FROM (SELECT vec_id, cell FROM asg WHERE vec_id >= 40000) b
       |LEFT JOIN (SELECT * FROM best WHERE rn = 1) t ON t.id_a = b.vec_id
       |ORDER BY b.vec_id""".stripMargin

  // ── q109: product-quantization ANN (ADC scan) ────────────────────────

  private val PqM = 8        // subspaces (PqM × PqSubDim = Dim)
  private val PqSubDim = 8   // dims per subspace
  private val PqSignBits = 4 // code bits per subspace → 16 codewords each

  /** q109: product-quantization ANN with asymmetric distance computation
    * (ADC) — the MEMORY-scale path of the ANN family (Jégou, Douze &
    * Schmid 2011, "Product quantization for nearest neighbor search").
    * Where q26/q81 bound CANDIDATES, PQ bounds BYTES: each 64-dim float
    * vector compresses to 8 × 4-bit codes (4 bytes vs 256 — 64×), so at
    * 100 TB of embeddings the scannable index is ~1.6 TB and the scoring
    * pass never touches a float vector — per query, a 128-entry integer
    * lookup table (one dot per (subspace, codeword)) replaces every
    * per-pair dot product, and candidate scores are 8 table-adds each.
    *
    * The codebook is DETERMINISTIC in this family's oracle discipline
    * (q81's move, applied per subspace): codewords are decimal-exact
    * component means of the sign-bucketed subvectors — each 8-dim
    * subvector lands in 1 of 16 groups by the sign pattern of its first
    * 4 components (a structured one-step quantizer: Lloyd's iteration
    * from a sign-hyperplane init, stopped where the arithmetic is still
    * engine-portable), then quantized to floor(x·10⁷) longs so every
    * downstream dot is exact integer math. Swap k-means codebooks in at
    * deployment and give up the value oracle for the q91-style recall
    * gate. Scores rank by the ADC cosine approximation dot(q, recon(x))
    * / (‖q‖·‖recon(x)‖), where ‖recon(x)‖² = Σ_sub ‖codeword‖² exactly
    * (subspaces are disjoint coordinates).
    *
    * Plan shape: codebook = one corpus pass (partial-aggregated groupBy
    * to 8×16×8 = 1 024 rows); encode = row-local sign arithmetic; LUT =
    * queries×128 broadcast; the scan joins each corpus code row to the
    * broadcast LUT and aggregates 8 rows per (query, vector) — one
    * shuffle whose width is queries × corpus GROUPS, the inherent cost
    * of a full ADC scan. At 100 TB compose with q81's coarse cells
    * (IVF-ADC: probe nprobe cells, ADC-score only in-cell codes) —
    * both stages are already bucketed on the same key family.
    */
  /** The 8 × 4-bit sign-code array of an `emb` column — row-local
    * arithmetic, the encoder of the whole PQ family.
    */
  private def pqCodesCol: Column = array((0 until PqM).map { m =>
    (0 until PqSignBits).map { b =>
      when(col("emb")(m * PqSubDim + b) >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }: _*)

  /** Row-local PQ encode: the corpus with its 8 × 4-bit sign codes. */
  private[graft] def pqCoded(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("emb"), pqCodesCol.as("codes"))

  /** Per-component explode with subspace/offset/code columns — the
    * shared input of the codebook build and the query-LUT build.
    */
  private[graft] def pqComps(coded: DataFrame): DataFrame =
    coded.select(col("vec_id"), col("codes"), posexplode(col("emb")).as(Seq("j", "v")))
      .withColumn("sub", expr(s"j div $PqSubDim"))
      .withColumn("jj", expr(s"j % $PqSubDim"))
      .withColumn("code", element_at(col("codes"), (col("sub") + 1).cast("int")))

  /** Codebook: per-(sub, code, component) decimal-exact mean, quantized
    * to a long — 8 × 16 × 8 = 1 024 rows from one partial-aggregated
    * corpus pass.
    */
  private[graft] def pqCodebook(comps: DataFrame): DataFrame =
    comps.groupBy("sub", "code", "jj")
      .agg(floor((Num.exactSum(col("v")).cast("double") / count(lit(1)))
        .cast("double") * lit(10000000.0)).cast("long").as("cw"))

  // ── Trained (k-means) PQ quantizer (round 11 — VERDICT r10 #1) ───────
  //
  // The deterministic sign quantizer stays the ORACLE family (DuckDB
  // replays it bit-for-bit); this block is the family a deployment
  // runs: Lloyd's iterations from the sign-bucket init, per subspace —
  // nearest-codeword assignment on exact integer distances, decimal-
  // exact mean updates. Deterministic end to end (no RNG: the init is
  // structured, every step exact arithmetic), so the trained codebook
  // is byte-equal across re-trainings of the same corpus — which is
  // what lets the append/rebuild specs assert FROZEN trained codebooks.

  /** The quantized component frame of a (vec_id, emb) set: one row per
    * (vector, component) with subspace/offset and the floor(v·10⁷) long
    * — shared by nearest assignment, mean updates, and the encoder.
    */
  private def pqQComps(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), posexplode(col("emb")).as(Seq("j", "v")))
      .withColumn("sub", expr(s"j div $PqSubDim"))
      .withColumn("jj", expr(s"j % $PqSubDim"))
      .withColumn("qv", floor(col("v") * lit(10000000.0)).cast("long"))

  /** Nearest-codeword assignment of every (vector, subspace) against a
    * broadcast codebook: exact integer squared distance
    * Σ_jj (qv − cw)², argmin with ties to the lower code. Returns
    * (vec_id, sub, code, dist). One batch-sized shuffle (the per-
    * (vector, subspace, codeword) partial aggregate); the window ranks
    * 16 rows per key.
    */
  private def pqNearestAssign(qcomps: DataFrame, codebook: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id", "sub").orderBy(col("dist").asc, col("code"))
    qcomps.join(broadcast(codebook), Seq("sub", "jj"))
      .groupBy("vec_id", "sub", "code")
      .agg(sum((col("qv") - col("cw")) * (col("qv") - col("cw"))).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "sub", "code", "dist")
  }

  /** The Lloyd mean update: decimal-exact per-(sub, code, jj) means of
    * the members `assign` routed to each codeword, quantized to longs —
    * [[pqCodebook]]'s aggregate over the TRAINED assignment instead of
    * the sign buckets. Codewords that attracted no member drop.
    */
  private def pqMeansFor(qcomps: DataFrame, assign: DataFrame): DataFrame =
    qcomps.join(assign.select("vec_id", "sub", "code"), Seq("vec_id", "sub"))
      .groupBy("sub", "code", "jj")
      .agg(floor((Num.exactSum(col("v")).cast("double") / count(lit(1)))
        .cast("double") * lit(10000000.0)).cast("long").as("cw"))

  /** TRAINED PQ codebook: `iters` Lloyd rounds per subspace from the
    * sign-bucket init. Each round pins its 1 024-row result eagerly and
    * frees the previous round's pin, so the loop holds O(|codebook|)
    * state. The returned frame is localCheckpoint-pinned — the caller
    * (refresh) frees it after materializing.
    */
  private[operators] def pqCodebookKmeans(vecs: DataFrame, iters: Int): DataFrame = {
    val qcomps = pqQComps(vecs)
    var cb = pqCodebook(pqComps(pqCoded(vecs))).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val next = pqMeansFor(qcomps, pqNearestAssign(qcomps, cb))
        .localCheckpoint(true)
      graft.Frames.freePinned(cb)
      cb = next
    }
    cb
  }

  /** Encode vectors by NEAREST CODEWORD against a broadcast codebook —
    * the trained family's encoder (the sign family encodes row-locally
    * from the vector alone). Returns (vec_id, codes) with codes[sub] =
    * the argmin codeword of that subspace. This is how FAISS encodes
    * against a trained PQ codebook; cost is one batch-sized aggregate
    * against 1 024 broadcast rows.
    */
  private[operators] def pqEncodeNearest(vecs: DataFrame,
                                         codebook: DataFrame): DataFrame =
    pqNearestAssign(pqQComps(vecs), codebook)
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), s -> s.code)")
        .as("codes"))

  def q109AnnPq(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, dir)
    val coded = pqCoded(e)
    val comps = pqComps(coded)
    // the r17 codebook pin is GONE (round 18): with the norms fused into
    // the LUT below, the LUT is the codebook's only consumer — one
    // codebook corpus pass by construction, no barrier job needed
    val cb = pqCodebook(comps)

    // the compressed corpus: one (vec_id, sub, code) row per subspace
    val corpusCodes = coded.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))

    // per-query LUT: exact integer dot of every query subvector with
    // every codeword — queries × 8 × 16 rows, broadcast. ONE broadcast
    // carries all three ADC ingredients (round 18 — VERDICT r17 #4): the
    // codeword norm n2 and the per-sub query norm qn2p ride the LUT rows
    // (Σ_sub over a candidate's 8 matched rows = recon2 / qnorm2 — long
    // sums, bit-identical), so the separate cbn and qn rollups — each a
    // broadcast build job on the serialized chain — are gone.
    val qsub = comps.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("sub"), col("jj"),
        floor(col("v") * lit(10000000.0)).cast("long").as("qv"))
    val lut = qsub.join(cb, Seq("sub", "jj"))
      .groupBy("q_id", "sub", "code")
      .agg(sum(col("qv") * col("cw")).as("d"),
        sum(col("cw") * col("cw")).as("n2"),
        sum(col("qv") * col("qv")).as("qn2p"))

    // ADC scan: 8 LUT adds per (query, vector); recon norm rides the
    // same 8 rows (Σ_sub codeword-norm² — exact, disjoint coordinates)
    val rankW = Window.partitionBy("q_id")
      .orderBy(col("adc_cosine").desc, col("vec_id"))
    corpusCodes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("d")).as("dot"), sum(col("n2")).as("recon2"),
        sum(col("qn2p")).as("qnorm2"))
      .withColumn("adc_cosine", Num.roundD(col("dot").cast("double")
        / sqrt(col("qnorm2").cast("double") * col("recon2").cast("double"))))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("adc_cosine"))
      .orderBy("q_id", "rank")
  }

  val q109Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |expl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM e),
       |sv AS (
       |  SELECT vec_id, j // $PqSubDim AS sub, j % $PqSubDim AS jj, v FROM expl),
       |codes AS (
       |  SELECT vec_id, sub,
       |    CAST(SUM(CASE WHEN jj < $PqSignBits AND v >= 0 THEN 1 << jj ELSE 0 END) AS INT) AS code
       |  FROM sv GROUP BY 1, 2),
       |cb AS (
       |  SELECT s.sub, c.code, s.jj,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(s.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000000.0) AS BIGINT) AS cw
       |  FROM sv s JOIN codes c ON c.vec_id = s.vec_id AND c.sub = s.sub
       |  GROUP BY 1, 2, 3),
       |cbn AS (SELECT sub, code, SUM(cw * cw) AS n2 FROM cb GROUP BY 1, 2),
       |q AS (
       |  SELECT vec_id AS q_id, sub, jj, CAST(FLOOR(v * 10000000.0) AS BIGINT) AS qv
       |  FROM sv WHERE vec_id < 50),
       |qn AS (SELECT q_id, SUM(qv * qv) AS qnorm2 FROM q GROUP BY 1),
       |lut AS (
       |  SELECT q.q_id, cb.sub, cb.code, SUM(q.qv * cb.cw) AS d
       |  FROM q JOIN cb ON cb.sub = q.sub AND cb.jj = q.jj
       |  GROUP BY 1, 2, 3),
       |adc AS (
       |  SELECT l.q_id, c.vec_id AS n_id, SUM(l.d) AS dot, SUM(n.n2) AS recon2
       |  FROM codes c
       |  JOIN lut l ON l.sub = c.sub AND l.code = c.code
       |  JOIN cbn n ON n.sub = c.sub AND n.code = c.code
       |  WHERE c.vec_id <> l.q_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT a.q_id, a.n_id,
       |    ${Num.sqlRoundD("CAST(a.dot AS DOUBLE) / SQRT(CAST(qn.qnorm2 AS DOUBLE) * CAST(a.recon2 AS DOUBLE))")} AS adc_cosine
       |  FROM adc a JOIN qn USING (q_id))
       |SELECT q_id, rank, n_id, adc_cosine FROM (
       |  SELECT q_id, n_id, adc_cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_cosine DESC, n_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin

  /** q110: the full production ANN stack — IVF coarse cells bound the
    * CANDIDATES (q81's deterministic per-label centroids, nprobe of
    * nlist), PQ-ADC bounds the BYTES scored per candidate (q109's 4-byte
    * codes and integer LUTs), and an exact-cosine RERANK of the ADC
    * top-C restores accuracy for the survivors only — the
    * IVFADC-with-reranking architecture of Jégou et al. 2011 §VI that
    * FAISS ships as `IVFx,PQy` + refine. The returned `cosine` is the
    * TRUE decimal-exact cosine (identical to what q25 reports for the
    * same pair), because the final ranking consumed float vectors for
    * at most C = 32 candidates per query.
    *
    * Why this composition is THE 100 TB shape: the coarse stage turns a
    * full-corpus scan into nprobe/nlist of it; the ADC stage means the
    * scanned fraction is read as 4-byte codes (64× less memory
    * bandwidth than floats) with 8 integer adds per candidate; the
    * rerank stage touches real vectors for only C rows per query — so
    * float I/O is O(queries × C), independent of corpus size. Every
    * stage is the oracle-pinnable twin of its production form (swap
    * k-means centroids/codebooks in at deployment, keep the plan).
    */
  def q110IvfPq(s: SparkSession, dir: String, nprobe: Int = 3,
                adcTopC: Int = 32, k: Int = 10,
                verify: String = "decimal"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(s, dir)

    // coarse quantizer: q81's per-label decimal-exact centroids
    val centroids = e.groupBy(col("label").as("cell")).agg(
      array((0 until Dim).map { j =>
        (Num.exactSum(col("emb")(j)).cast("double") / count(lit(1))).cast("double")
      }: _*).as("centroid"))
      .withColumn("qcent", expr(s"transform(centroid, x -> CAST(FLOOR(x * $QScale) AS BIGINT))"))
      .withColumn("cnorm2",
        expr("aggregate(zip_with(qcent, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
      // pinned (round 17 — the q81 rule): assignment + probes each
      // broadcast this nlist-row aggregate
      .localCheckpoint(true)
    def qdot(a: String): Column = expr(
      s"CAST(aggregate(zip_with($a, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)")
    val simOf: Column => Column = qv => qv / sqrt(col("cnorm2").cast("double"))
    val withQ = e.withColumn("qemb",
      expr(s"transform(emb, x -> CAST(FLOOR(x * $QScale) AS BIGINT))"))
    val simW = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))
    val assigned = withQ.crossJoin(broadcast(centroids))
      .withColumn("sim", simOf(qdot("qemb")))
      .withColumn("rn", row_number().over(simW))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"))
    val probeW = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
    val probes = withQ.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("qemb"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", simOf(qdot("qemb")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select("q_id", "cell")
    // candidates bounded by the probed cells — the one corpus-sized join
    val cands = broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")

    // PQ stage: ADC-score ONLY the in-cell candidates
    val coded = pqCoded(e)
    val comps = pqComps(coded)
    // the r17 codebook pin is GONE (round 18): with the norms fused into
    // the LUT below, the LUT is the codebook's only consumer — one
    // codebook corpus pass by construction, no barrier job needed
    val cb = pqCodebook(comps)
    val corpusCodes = coded.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    // ONE broadcast carries LUT + codeword norm + per-sub query norm
    // (round 18 — VERDICT r17 #4, the q109/pqTopKFrames fusion): the cbn
    // and qn rollups were separate broadcast builds on the serial chain
    val qsub = comps.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("sub"), col("jj"),
        floor(col("v") * lit(10000000.0)).cast("long").as("qv"))
    val lut = qsub.join(cb, Seq("sub", "jj"))
      .groupBy("q_id", "sub", "code")
      .agg(sum(col("qv") * col("cw")).as("d"),
        sum(col("cw") * col("cw")).as("n2"),
        sum(col("qv") * col("qv")).as("qn2p"))
    val adcW = Window.partitionBy("q_id")
      .orderBy(col("adc_cosine").desc, col("vec_id"))
    val shortlist = cands.join(corpusCodes, Seq("vec_id"))
      .join(broadcast(lut), Seq("q_id", "sub", "code"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("d")).as("dot"), sum(col("n2")).as("recon2"),
        sum(col("qn2p")).as("qnorm2"))
      .withColumn("adc_cosine", Num.roundD(col("dot").cast("double")
        / sqrt(col("qnorm2").cast("double") * col("recon2").cast("double"))))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter(col("adc_rank") <= adcTopC)
      .select("q_id", "vec_id")

    // rerank stage: exact cosines for ≤ C survivors per query —
    // verify="decimal" is the oracle contract; "float" is the fused
    // native kernel (x110's bench twin, the x81/x95 discipline)
    val rerank: Column = verify match {
      case "decimal" => cosineDec("q_emb", "emb")
      case "float" => Num.roundD(cosine(col("q_emb"), col("emb")))
      case other => throw new IllegalArgumentException(
        s"verify must be decimal or float, got $other")
    }
    val vecs = e.select(col("vec_id"), col("emb"))
    val rankW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    broadcast(shortlist
        .join(broadcast(vecs.filter(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))), Seq("q_id")))
      .join(vecs, Seq("vec_id"))
      .withColumn("cosine", rerank)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val q110Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |expl AS (
       |  SELECT vec_id, label, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM e),
       |-- coarse stage (q81's CTEs): deterministic per-label centroids,
       |-- integer-quantized; argmax cell per vector; nprobe cells per query
       |cent AS (
       |  SELECT label AS cell, j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq
       |  FROM expl GROUP BY 1, 2),
       |vdots AS (
       |  SELECT x.vec_id, ct.cell,
       |    SUM(CAST(FLOOR(x.v * $QScale) AS BIGINT) * ct.cq) AS dvc
       |  FROM expl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |cnorm AS (SELECT cell, SUM(cq * cq) AS n2 FROM cent GROUP BY 1),
       |sims AS (
       |  SELECT d.vec_id, d.cell,
       |    CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE)) AS sim
       |  FROM vdots d JOIN cnorm c ON c.cell = d.cell),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
       |    FROM sims) t
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cell FROM (
       |    SELECT vec_id, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
       |    FROM sims WHERE vec_id < 50) t
       |  WHERE rn <= 3),
       |cands AS (
       |  SELECT DISTINCT p.q_id, a.vec_id
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.q_id),
       |-- PQ stage (q109's CTEs): sign codes, decimal-exact codebook,
       |-- per-query integer LUT, ADC over the candidates only
       |sv AS (
       |  SELECT vec_id, j // $PqSubDim AS sub, j % $PqSubDim AS jj, v FROM expl),
       |codes AS (
       |  SELECT vec_id, sub,
       |    CAST(SUM(CASE WHEN jj < $PqSignBits AND v >= 0 THEN 1 << jj ELSE 0 END) AS INT) AS code
       |  FROM sv GROUP BY 1, 2),
       |cb AS (
       |  SELECT s.sub, c.code, s.jj,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(s.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000000.0) AS BIGINT) AS cw
       |  FROM sv s JOIN codes c ON c.vec_id = s.vec_id AND c.sub = s.sub
       |  GROUP BY 1, 2, 3),
       |cbn AS (SELECT sub, code, SUM(cw * cw) AS n2 FROM cb GROUP BY 1, 2),
       |q AS (
       |  SELECT vec_id AS q_id, sub, jj, CAST(FLOOR(v * 10000000.0) AS BIGINT) AS qv
       |  FROM sv WHERE vec_id < 50),
       |qn AS (SELECT q_id, SUM(qv * qv) AS qnorm2 FROM q GROUP BY 1),
       |lut AS (
       |  SELECT q.q_id, cb.sub, cb.code, SUM(q.qv * cb.cw) AS d
       |  FROM q JOIN cb ON cb.sub = q.sub AND cb.jj = q.jj
       |  GROUP BY 1, 2, 3),
       |adc AS (
       |  SELECT c.q_id, c.vec_id, SUM(l.d) AS dot, SUM(n.n2) AS recon2
       |  FROM cands c
       |  JOIN codes k ON k.vec_id = c.vec_id
       |  JOIN lut l ON l.q_id = c.q_id AND l.sub = k.sub AND l.code = k.code
       |  JOIN cbn n ON n.sub = k.sub AND n.code = k.code
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT a.q_id, a.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY a.q_id ORDER BY
       |        ${Num.sqlRoundD("CAST(a.dot AS DOUBLE) / SQRT(CAST(qn.qnorm2 AS DOUBLE) * CAST(a.recon2 AS DOUBLE))")} DESC,
       |        a.vec_id) AS rn
       |    FROM adc a JOIN qn USING (q_id)) t
       |  WHERE rn <= 32),
       |-- rerank stage: exact decimal cosines for the ADC survivors only
       |pdots AS (
       |  SELECT s.q_id, s.vec_id, SUM(CAST(qa.v * qb.v AS DECIMAL(25,12))) AS dotp
       |  FROM short s
       |  JOIN expl qa ON qa.vec_id = s.q_id
       |  JOIN expl qb ON qb.vec_id = s.vec_id AND qb.j = qa.j
       |  GROUP BY 1, 2),
       |vn AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2 FROM expl GROUP BY 1),
       |scored AS (
       |  SELECT d.q_id, d.vec_id AS n_id,
       |    ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))")} AS cosine
       |  FROM pdots d
       |  JOIN vn na ON na.vec_id = d.q_id
       |  JOIN vn nb ON nb.vec_id = d.vec_id)
       |SELECT q_id, rank, n_id, cosine FROM (
       |  SELECT q_id, n_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin

  // ── Standing IVF-PQ index (round 10 — VERDICT r9 #1) ─────────────────
  //
  // q110 is the production ANN stack, but as a QUERY it rebuilds the
  // codebook and re-encodes the corpus per run. This block gives the PQ
  // family the same day-2 lifecycle the band index (Dedup.refreshIndex)
  // and semantic index (refreshSemanticIndex) got in r7/r8:
  // refresh / append / probe / serve over materialized tables, with the
  // rebuildSemanticIndex discipline extended one level — under an append
  // or a crash repair, neither the coarse CELLS nor the PQ CODEWORDS
  // move (both are defined at refresh time; re-deriving either against
  // grown data would silently re-encode the standing corpus and
  // invalidate every stored code).

  /** The standing IVF-PQ state as three tables:
    *   - `<table>_centroids` (cell, qcent, cnorm2): the coarse
    *     quantizer — nlist rows, broadcast by every consumer;
    *   - `<table>_codebook` (sub, code, jj, cw): the PQ decode side —
    *     8×16×8 = 1 024 rows, broadcast by every consumer. Frozen
    *     between refreshes: stored codes are only meaningful against
    *     the codebook that minted them;
    *   - `<table>` (vec_id, codes, emb, cell), PARTITIONED BY cell:
    *     one row per member with its 8 × 4-bit code array AND its float
    *     vector. Parquet is columnar, so the ADC scan reads only
    *     (vec_id, codes, cell) — the 4-byte-per-vector memory-bandwidth
    *     contract — while the rerank's second scan reads (vec_id, emb,
    *     cell) for the probed cells only; at 100 TB the codes column is
    *     ~64× smaller than the vectors it ranks.
    *
    * Encoding in this family is the ORACLE-PORTABLE structured
    * quantizer (q109's sign codes): row-local arithmetic on the vector
    * itself, so a batch encodes without reading the codebook at all. A
    * k-means deployment swaps [[pqCodebook]] for trained codewords and
    * encodes by nearest-codeword against the broadcast `_codebook`
    * table — the lifecycle (and the frozen-under-append rule) is
    * unchanged.
    */
  /** `quantizer`: `"sign"` (default) is the deterministic oracle-
    * pinnable family — q109's structured one-step quantizer, replayed
    * bit-for-bit by DuckDB (q112's value oracle anchors it).
    * `"kmeans"` is the TRAINED family a deployment runs (VERDICT r10
    * #1): [[centroidTableKmeans]] coarse cells and [[pqCodebookKmeans]]
    * codewords — `lloydIters` deterministic Lloyd rounds from the same
    * seeds — with members encoded by NEAREST CODEWORD against the
    * trained codebook. Same three-table lifecycle either way, plus a
    * `<table>_meta` row recording the choice so [[appendPqIndex]] /
    * [[rebuildPqIndex]] encode batches with the matching encoder; both
    * families freeze centroids AND codebook under append and repair.
    */
  def refreshPqIndex(index: DataFrame, table: String, splits: Int = 0,
                     quantizer: String = "sign", lloydIters: Int = 2,
                     // ≥ 0 calibrates the ADMISSION nprobe at refresh
                     // time (round 13 — VERDICT r12 #2): the smallest
                     // nprobe whose held-out re-encode screen recall
                     // meets the target is persisted in `_meta`, and
                     // [[probePqIndex]]'s auto default reads it — the
                     // row-175 move (nlist ∝ √N) applied to the last
                     // hand-set ANN knob
                     screenRecallTarget: Double = -1.0): Unit = {
    require(quantizer == "sign" || quantizer == "kmeans",
      s"quantizer must be sign or kmeans, got $quantizer")
    val s = index.sparkSession
    // reader-side snapshot isolation (round 14 — VERDICT r13 #2): the
    // whole four-table generation (members, centroids, codebook, meta)
    // lands under versioned physical names, the pointer swaps ATOMICALLY
    // after the calibration, and the previous generation retires one
    // refresh later — a serving read racing this refresh keeps its
    // resolved generation's files ([[graft.sources.TablePointer]])
    val phys = graft.sources.TablePointer.stage(s, table)
    // splits: the nlist knob (centroidTable doc). The DEFAULT is now the
    // rule, not a constant (VERDICT r10 #2): splits ≤ 0 computes
    // [[autoSplits]] from the member count at refresh time, so a refresh
    // at a grown corpus raises nlist ∝ √N with NO hand-set knob and
    // probe candidate sets keep their size; a positive value overrides.
    val sp = resolveSplits(index, splits)
    val vecsOnly = index.select(col("vec_id"), col("emb"))
    val centroids =
      if (quantizer == "kmeans") centroidTableKmeans(index, sp, lloydIters)
      else centroidTable(index, sp)
    val codebook =
      if (quantizer == "kmeans") pqCodebookKmeans(vecsOnly, lloydIters)
      else pqCodebook(pqComps(pqCoded(vecsOnly)))
    try {
      graft.sources.Ingest.clearStaleLocation(s, s"${phys}_centroids")
      centroids.write.mode("overwrite").format("parquet")
        .saveAsTable(s"${phys}_centroids")
      graft.sources.Ingest.clearStaleLocation(s, s"${phys}_codebook")
      codebook.write.mode("overwrite").format("parquet")
        .saveAsTable(s"${phys}_codebook")
      writePqMeta(s, phys, quantizer)
      writePqMembers(assignCellsLean(index, centroids), phys,
        overwrite = true, encodeCodes(s, phys, quantizer))
      // calibration must see the members it will screen against, so it
      // runs against the STAGED generation (resolution is identity on a
      // physical name) and rewrites its meta row BEFORE the swap — the
      // pointer only ever lands on a fully-calibrated generation
      if (screenRecallTarget >= 0)
        calibratePqScreenNprobe(s, phys, screenRecallTarget)
      graft.sources.TablePointer.swap(s, table, phys)
      graft.sources.TablePointer.retire(s, table, PqSuffixes)
    } finally if (quantizer == "kmeans") {
      // the Lloyd loops return eagerly-pinned frames (their own rounds'
      // hygiene) — freed once materialized as tables
      graft.Frames.freePinned(centroids)
      graft.Frames.freePinned(codebook)
    }
  }

  /** The PQ family's companion-table suffixes (retire/drop). */
  private val PqSuffixes = Seq("_centroids", "_codebook", "_meta")

  /** The CURRENT generation's physical name of a standing index — the
    * [[graft.sources.TablePointer]] resolution, identity for
    * pre-generation tables. Callers that read an index's side tables
    * directly (a spec, a rehearsal main, [[graft.Admit]]'s intra-batch
    * cell source) resolve through this instead of assuming the logical
    * name is physical.
    */
  def physicalOf(s: SparkSession, table: String): String =
    graft.sources.TablePointer.resolve(s, table)

  /** The standing `_centroids` side table of an index, current
    * generation — both vector-index families expose it.
    */
  def centroidsOf(s: SparkSession, table: String): DataFrame =
    s.table(s"${physicalOf(s, table)}_centroids")

  /** The standing index's quantizer family, from its `_meta` side table
    * — `"sign"` for tables refreshed before the meta row existed.
    */
  private def pqQuantizerOf(s: SparkSession, table0: String): String = {
    val table = graft.sources.TablePointer.resolve(s, table0)
    // only a MISSING meta table falls back (pre-r11 indexes are all
    // sign-family by construction); any other failure must surface —
    // silently mis-encoding a kmeans index's appends as sign codes
    // would corrupt the standing members
    if (!s.catalog.tableExists(s"${table}_meta")) "sign"
    else s.table(s"${table}_meta").select("quantizer").collect().headOption
      .map(_.getString(0))
      // an existing-but-EMPTY meta is corruption (a crash between
      // clearStaleLocation and the parquet commit, or a manual
      // truncation) — name the side table instead of surfacing a bare
      // NoSuchElementException (ADVICE r11)
      .getOrElse(throw new IllegalStateException(
        s"${table}_meta exists but holds no quantizer row — the side " +
          s"table is corrupt (crash mid-refresh or manual truncation); " +
          s"re-run refreshPqIndex on $table to rewrite it"))
  }

  private def writePqMeta(s: SparkSession, table: String,
                          quantizer: String,
                          screenNprobe: Int = -1,
                          recallTarget: Double = -1.0,
                          recallMeasured: Double = -1.0,
                          // member count WHEN the sweep ran (round 16 —
                          // VERDICT r15 #2): the staleness anchor; −1 =
                          // never calibrated / pre-column legacy row
                          docsAtCal: Long = -1L): Unit = {
    import s.implicits._
    graft.sources.Ingest.clearStaleLocation(s, s"${table}_meta")
    // -1 sentinels = "not calibrated": the screen columns exist from the
    // first write so readers never need a second schema probe, but only
    // a calibration run puts real values in them
    Seq((quantizer, screenNprobe, recallTarget, recallMeasured, docsAtCal))
      .toDF("quantizer", "screen_nprobe", "screen_recall_target",
        "screen_recall_measured", "docs_at_cal")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}_meta")
  }

  /** The calibrated admission nprobe of a standing index, from its
    * `_meta` row — None for an index never calibrated (pre-r13 metas
    * have no column; -1 sentinels mean "refresh ran uncalibrated").
    */
  private[graft] def pqScreenNprobeOf(s: SparkSession, table0: String): Option[Int] = {
    val table = graft.sources.TablePointer.resolve(s, table0)
    if (!s.catalog.tableExists(s"${table}_meta")) None
    else {
      val m = s.table(s"${table}_meta")
      if (!m.columns.contains("screen_nprobe")) None
      else m.select("screen_nprobe").collect().headOption
        .map(_.getInt(0)).filter(_ >= 1)
    }
  }

  /** The member count the standing index's nprobe calibration probed
    * against — −1 for an index never calibrated or a pre-r16 `_meta`
    * row (drift unknowable, stated, not zero). The band/text families'
    * docs_at_cal staleness anchor, for the PQ screen knob.
    */
  private[graft] def pqScreenDocsAtCalOf(s: SparkSession, table0: String): Long = {
    val table = graft.sources.TablePointer.resolve(s, table0)
    if (!s.catalog.tableExists(s"${table}_meta")) -1L
    else {
      val m = s.table(s"${table}_meta")
      if (!m.columns.contains("docs_at_cal")) -1L
      else m.select("docs_at_cal").collect().headOption
        .map(_.getLong(0)).getOrElse(-1L)
    }
  }

  /** Held-out re-encode screen recall of a standing [[refreshPqIndex]]
    * table at one nprobe: a deterministic sample of the index's OWN
    * members, each rotated to the BOUNDARY re-encode (exact cosine
    * eps + (1−eps)/2 — see [[pqScreenProbes]]: off-axis, so a cell
    * boundary or an ADC top-C cut can genuinely lose it, unlike a
    * scale-invariant `emb · 0.99` which can never miss) probes the
    * index, and recall is the flagged fraction. This is the hardest
    * in-class event the admission PQ screen exists for, measured
    * against the standing state itself — no external truth set needed.
    */
  def pqScreenRecall(s: SparkSession, table: String, nprobe: Int,
                     nSample: Int = 100, eps: Double = 0.99): Double = {
    val probes = pqScreenProbes(s, table, nSample, eps)
    try {
      val n = probes.count()
      require(n > 0, s"$table has no members to calibrate against")
      val flagged = probePqIndex(s, table, probes, eps, nprobe)
        .filter(col("is_dup") === 1).count()
      flagged.toDouble / n
    } finally graft.Frames.freePinned(probes)
  }

  /** The calibration's held-out probe set: a deterministic sample of
    * the index's own members, each re-encoded at EXACT cosine
    * cosθ = eps + (1−eps)/2 to its source — in-class by a clear margin
    * but rotated off-axis: v' = v·cosθ + u·sinθ·(|v|/|u|) with u the
    * pairwise rotation (u₂ₖ = −v₂ₖ₊₁, u₂ₖ₊₁ = v₂ₖ; odd last
    * coordinate zeroed), orthogonal to v by construction, so
    * cos(v, v') = cosθ in exact arithmetic. Degenerate rows (all mass
    * on an unpaired last coordinate, or a zero vector) degrade to the
    * direction-preserving v·cosθ (cosine 1 — they cannot miss).
    */
  private[graft] def pqScreenProbes(s: SparkSession, table: String,
                             nSample: Int,
                             eps: Double): org.apache.spark.sql.DataFrame = {
    val members = s.table(graft.sources.TablePointer.resolve(s, table))
      .select("vec_id", "emb")
    val n = members.count()
    require(n > 0, s"$table has no members to calibrate against")
    val step = math.max(1L, n / nSample)
    // the held-out event is the BOUNDARY re-encode: exact cosine midway
    // between the screen threshold and identity — in-class by a clear
    // margin, but rotated off-axis so the probe's failure modes (cell
    // miss, ADC cut) are actually exercised (review r13: the previous
    // v·0.99 probe was scale-invariant and could never miss)
    val cosTheta = eps + (1.0 - eps) * 0.5
    val sinTheta = math.sqrt(math.max(0.0, 1.0 - cosTheta * cosTheta))
    val n2 = expr("aggregate(emb, 0D, (a, x) -> a + x * x)")
    val lastSq = expr(
      "CASE WHEN size(emb) % 2 = 1 THEN element_at(emb, -1) * element_at(emb, -1) ELSE 0D END")
    // id-modulo is the preferred (cheap, deterministic) pick, but sparse
    // or non-uniform ids can leave it EMPTY (all-odd ids with an even
    // step — ADVICE r13); the fallback keeps the probe set non-empty
    // whenever members exist, so recall can never become 0/0 = NaN
    val preferred = members.filter(col("vec_id") % step === 0)
    val sampled = if (preferred.isEmpty) members else preferred
    // pinned: the sweep probes this frame once per candidate nprobe, and
    // an unpinned plan would rescan the members table each time
    sampled.orderBy("vec_id").limit(nSample)
      .withColumn("__n2", n2)
      .withColumn("__un2", n2 - lastSq)
      .withColumn("__sin_scale",
        when(col("__un2") > 0, lit(sinTheta) * sqrt(col("__n2") / col("__un2")))
          .otherwise(lit(0.0)))
      .select((col("vec_id") + 900000000L).as("vec_id"),
        expr(s"""transform(emb, (x, i) -> x * $cosTheta +
          (CASE WHEN i % 2 = 0 THEN
             (CASE WHEN i + 2 <= size(emb) THEN -element_at(emb, i + 2) ELSE 0D END)
           ELSE element_at(emb, i) END) * __sin_scale)""").as("emb"))
      .localCheckpoint(true)
  }

  /** Derive the admission nprobe from a target screen recall (round 13
    * — VERDICT r12 #2): sweep nprobe upward from 1 against a held-out
    * re-encode sample of the index's own members, pick the SMALLEST
    * value meeting `targetRecall`, and persist the choice (plus the
    * measured recall) in the `_meta` row beside the quantizer family —
    * [[probePqIndex]]'s auto default (nprobe = 0) then reads it, so
    * every admission cycle runs at a knob the index's own recall
    * artifact justified rather than a hand-set constant. When even
    * `maxNprobe` misses the target, maxNprobe is persisted with its
    * measured recall — the residual is then the persisted target's
    * documented complement, never a silent choice. Cost: ≤ maxNprobe
    * batch-sized probe runs, paid once per refresh.
    */
  def calibratePqScreenNprobe(s: SparkSession, table0: String,
                              targetRecall: Double = 0.99,
                              nSample: Int = 100,
                              maxNprobe: Int = 8,
                              eps: Double = 0.99): (Int, Double) = {
    // resolve ONCE: the sweep's probes and the meta write must target
    // the same generation (refreshPqIndex passes the staged physical
    // name — identity under resolve — so pre-swap calibration works)
    val table = graft.sources.TablePointer.resolve(s, table0)
    val probes = pqScreenProbes(s, table, nSample, eps)
    val (chosen, measured) = try {
      val n = probes.count()
      // mirror pqScreenRecall's guard (ADVICE r13): an empty probe set
      // would make every recall 0/0 = NaN, every `>= target` false, and
      // silently persist maxNprobe with a NaN measured recall
      require(n > 0, s"calibration probe set for $table is empty — " +
        "the index has no members to re-encode against")
      var np = 1
      var recall = 0.0
      var done = false
      while (np <= maxNprobe && !done) {
        val flagged = probePqIndex(s, table, probes, eps, np)
          .filter(col("is_dup") === 1).count()
        recall = flagged.toDouble / n
        if (recall >= targetRecall || np == maxNprobe) done = true
        else np += 1
      }
      (np, recall)
    } finally graft.Frames.freePinned(probes)
    if (measured < targetRecall) System.err.println(
      s"[graft.Ann] screen-recall calibration on $table: even nprobe " +
        s"$maxNprobe reaches only $measured < target $targetRecall — " +
        "persisting maxNprobe; the residual is the target's complement")
    // docs_at_cal: the member count the sweep probed against (VERDICT
    // r15 #2 — appends growing the index past this anchor show as drift
    // in the standing-state report, and recalibratePqScreen is the
    // post-incident resweep)
    writePqMeta(s, table, pqQuantizerOf(s, table), chosen, targetRecall,
      measured, s.table(table).count())
    (chosen, measured)
  }

  /** The member encoder of a quantizer family: sign codes are row-local
    * arithmetic on the vector itself; trained codes are nearest-codeword
    * against the STANDING broadcast codebook (which is exactly why the
    * codebook must freeze under append — a moved codeword would silently
    * re-interpret every stored code).
    */
  private def encodeCodes(s: SparkSession, table: String,
                          quantizer: String): DataFrame => DataFrame =
    if (quantizer == "kmeans")
      df => df.join(
        pqEncodeNearest(df.select(col("vec_id"), col("emb")),
          s.table(s"${table}_codebook")), Seq("vec_id"))
    else
      df => df.withColumn("codes", pqCodesCol)

  /** Members write shared by refresh/append/rebuild: codes are the
    * row-local sign arithmetic of [[pqCoded]], landed partitioned by
    * cell so serving probes prune to their nprobe cells' files.
    */
  private def writePqMembers(assigned: DataFrame, table: String,
                             overwrite: Boolean,
                             encode: DataFrame => DataFrame): Unit = {
    if (overwrite)
      graft.sources.Ingest.clearStaleLocation(assigned.sparkSession, table)
    encode(assigned)
      .select(col("vec_id"), col("codes"), col("emb"), col("cell"))
      // one file per cell partition per write (writeBucketed's
      // discipline at the partition grain): each cell hashes to one
      // task, so files-per-partition = 1 + appends since the last
      // rewrite — what makes [[graft.sources.Ingest.needsCompaction]]'s
      // partition-grain dispatch a meaningful trigger
      .repartition(col("cell"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .format("parquet").partitionBy("cell").saveAsTable(table)
  }

  /** Incremental IVF-PQ maintenance: encode ONLY the batch and append
    * it under the standing cells — the [[appendSemanticIndex]] contract
    * plus the codebook rule: cells come from the STANDING broadcast
    * centroids, codes from the refresh-time quantizer, and neither
    * table is touched (codewords must not move under an append — every
    * stored code is an index into the refresh-time codebook). One
    * batch-sized pass; the corpus is never re-read.
    */
  def appendPqIndex(s: SparkSession, table: String, batch: DataFrame): Unit = {
    // additive, lock-serialized, current-generation (appendSemanticIndex)
    val t = graft.sources.TablePointer.resolve(s, table)
    writePqMembers(assignCellsLean(batch, s.table(s"${t}_centroids")),
      t, overwrite = false, encodeCodes(s, t, pqQuantizerOf(s, t)))
    // refresh through the PROBING session (Dedup.appendIndex): a
    // foreachBatch clone's cached listing must not hide this append
    s.catalog.refreshTable(t)
  }

  /** Rebuild the members table of a standing [[refreshPqIndex]] index
    * from `vecs` alone, KEEPING centroids and codebook — the crash-
    * recovery write ([[graft.Admit]]'s WAL repair, the
    * [[rebuildSemanticIndex]] discipline): cells and codewords are
    * defined at refresh time and must not move under a repair; orphan
    * member rows from an uncommitted append vanish because the write is
    * an overwrite derived from `vecs` alone.
    */
  def rebuildPqIndex(s: SparkSession, table: String, vecs: DataFrame): Unit = {
    // crash-repair in-place rewrite of the CURRENT generation — under
    // the admission lock, frozen centroids/codebook (rebuildSemanticIndex)
    val t = graft.sources.TablePointer.resolve(s, table)
    writePqMembers(assignCellsLean(vecs, s.table(s"${t}_centroids")),
      t, overwrite = true, encodeCodes(s, t, pqQuantizerOf(s, t)))
    s.catalog.refreshTable(t)
  }

  /** The IVF-PQ-rerank read path over a standing [[refreshPqIndex]]
    * table — q110's three stages against materialized state: broadcast
    * centroids assign each query its `nprobe` cells; the ADC stage
    * scans ONLY those cells' code rows (partition pruning via the
    * broadcast probe join), scoring 8 integer LUT adds per candidate;
    * the exact rerank touches float vectors for the ADC top-`adcTopC`
    * survivors per query only. Returns (q_id, rank, n_id, cosine, cell)
    * rows, rank ≤ `k`, cosine the TRUE cosine of the survivors
    * (`verify = "dec"` decimal-exact — bit-equal to q25's for the same
    * pair; `"float"` the fused native kernel for serving).
    *
    * Query frames BROADCAST (their LUTs are |Q|×128 rows), so the same
    * load-shape guard as [[searchSemanticIndex]] applies: corpus-sized
    * query sets must fail loudly, not OOM the driver.
    */
  private def pqTopK(s: SparkSession, table: String, queries: DataFrame,
                     k: Int, nprobe: Int, adcTopC: Int,
                     verify: String): DataFrame = {
    // one resolution binds the whole (members, centroids, codebook)
    // triple to a single consistent generation — the reader contract
    val t = graft.sources.TablePointer.resolve(s, table)
    pqTopKFrames(s.table(t), s.table(s"${t}_centroids"),
      s.table(s"${t}_codebook"), queries, k, nprobe, adcTopC, verify)
  }

  /** The IVF-PQ-rerank read path over ARBITRARY state frames — the core
    * [[pqTopK]] (table-backed serving) and [[q112PqProbe]] (the
    * self-contained oracle twin) share. `members` is (vec_id, codes,
    * emb, cell) — exactly what [[refreshPqIndex]] materializes.
    */
  /** The ranked probe-cell frame of a query batch against broadcast
    * centroids: (q_id, cell, rn) with rn ≤ `upTo`, ordered (csim desc,
    * cell) — the one coarse ranking [[pqTopKFrames]]' nprobe restriction
    * AND a probe's own-cell assignment (rn = 1) both derive from, so a
    * caller needing both computes the batch × centroids argmax ONCE
    * (round 17: q112 used to run the identical crossJoin + window chain
    * twice, once per consumer).
    */
  private def pqProbeRanked(queries: DataFrame, centroids: DataFrame,
                            upTo: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probeW = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cell"))
    val qe = queries
      .withColumn("qemb", quantize(col("emb")))
      .withColumn("qn2", expr(
        "aggregate(zip_with(qemb, qemb, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
    val qdot = expr(
      "CAST(aggregate(zip_with(qemb, qcent, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v) AS DOUBLE)")
    qe.crossJoin(broadcast(centroids))
      .withColumn("csim",
        qdot / sqrt(col("cnorm2").cast("double") * col("qn2").cast("double")))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= upTo)
      .select(col("vec_id").as("q_id"), col("cell"), col("rn"))
  }

  private def pqTopKFrames(members: DataFrame, centroids: DataFrame,
                           codebook: DataFrame, queries: DataFrame,
                           k: Int, nprobe: Int, adcTopC: Int,
                           verify: String,
                           // a precomputed (q_id, cell, rn ≤ nprobe)
                           // probe ranking, when the caller already owns
                           // one ([[pqProbeRanked]]) — None computes it
                           probesOpt: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // coarse stage: nprobe cells per query, via the broadcast centroids
    val probes = probesOpt.getOrElse(pqProbeRanked(queries, centroids, nprobe))
      .select("q_id", "cell")

    // per-query integer LUT against the STANDING codebook: |Q| × 8 × 16
    // rows, broadcast — the only per-query state the ADC scan touches.
    // ONE broadcast carries all three ADC ingredients (round 18 — VERDICT
    // r17 #4, q112's serialized job chain): the codeword norm n2 and the
    // per-sub query norm qn2p ride the LUT rows the grouping already
    // enumerates (n2 = Σ_jj cw² per (sub, code); Σ_sub qn2p = the full
    // query norm, since every candidate matches exactly one LUT row per
    // sub), so the separate cbn and qn rollups — each a broadcast build
    // job on the critical path — are gone. Long sums, bit-identical.
    val qcomps = pqComps(pqCoded(queries.select(col("vec_id"), col("emb"))))
      .select(col("vec_id").as("q_id"), col("sub"), col("jj"),
        floor(col("v") * lit(10000000.0)).cast("long").as("qv"))
    val lut = qcomps.join(broadcast(codebook), Seq("sub", "jj"))
      .groupBy("q_id", "sub", "code")
      .agg(sum(col("qv") * col("cw")).as("d"),
        sum(col("cw") * col("cw")).as("n2"),
        sum(col("qv") * col("qv")).as("qn2p"))

    // ADC stage: probed cells' code rows only (the broadcast cell join
    // prunes the partitioned scan); 8 LUT adds per candidate
    val adcW = Window.partitionBy("q_id")
      .orderBy(col("adc_cosine").desc, col("vec_id"))
    val shortlist = members
      .select(col("vec_id"), col("cell"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(lut), Seq("q_id", "sub", "code"))
      .groupBy("q_id", "vec_id", "cell")
      .agg(sum(col("d")).as("dot"), sum(col("n2")).as("recon2"),
        sum(col("qn2p")).as("qnorm2"))
      .withColumn("adc_cosine", Num.roundD(col("dot").cast("double")
        / sqrt(col("qnorm2").cast("double") * col("recon2").cast("double"))))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter(col("adc_rank") <= adcTopC)
      .select("q_id", "vec_id", "cell")

    // rerank stage: float vectors for ≤ adcTopC survivors per query —
    // the (vec_id, cell) join key keeps the second scan cell-pruned
    val rerank: Column = verify match {
      case "dec" => cosineDec("q_emb", "emb")
      case "float" => Num.roundD(cosine(col("q_emb"), col("emb")))
      case other => throw new IllegalArgumentException(
        s"verify must be dec or float, got $other")
    }
    val rankW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    members.select(col("vec_id"), col("emb"), col("cell"))
      .join(broadcast(shortlist
        .join(broadcast(queries.select(col("vec_id").as("q_id"),
          col("emb").as("q_emb"))), Seq("q_id"))), Seq("vec_id", "cell"))
      .withColumn("cosine", rerank)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id").as("n_id"),
        col("cosine"), col("cell"))
  }

  /** Top-k ANN SEARCH against a standing [[refreshPqIndex]] table — the
    * serving path ([[searchSemanticIndex]]'s role for the PQ family),
    * with the same loud load-shape guard on the broadcast premise.
    */
  def searchPqIndex(s: SparkSession, table: String, queries: DataFrame,
                    k: Int = 10, nprobe: Int = 3, adcTopC: Int = 32,
                    verify: String = "float",
                    maxQueryRows: Long = 100000L): DataFrame = {
    val nQ = queries.count()
    require(nQ <= maxQueryRows,
      s"searchPqIndex broadcasts its query set (the per-query ADC LUTs), " +
        s"and $nQ query rows exceed maxQueryRows=$maxQueryRows — this is a " +
        "serving path for small probe batches. For corpus-sized probes " +
        "use the bucketed dedup probe (Ann.probeSemanticIndex), or raise " +
        "maxQueryRows deliberately.")
    pqTopK(s, table, queries, k, nprobe, adcTopC, verify)
      .select("q_id", "rank", "n_id", "cosine")
      .orderBy("q_id", "rank")
  }

  /** Near-dup PROBE of a batch against a standing [[refreshPqIndex]]
    * table — the admission-screen shape ([[probeSemanticIndex]]'s
    * contract: one row per batch vector, null match for vectors
    * matching nowhere, `is_dup` at `eps`), served by the IVF-PQ-rerank
    * read path: the best SURVIVING candidate's exact cosine decides,
    * so a paraphrase that ADC ranks highly is verified on real floats
    * before it can reject a document. Same broadcast premise and guard
    * as [[searchPqIndex]] — admission batches are small by definition.
    */
  def probePqIndex(s: SparkSession, table: String, batch: DataFrame,
                   // 0 = AUTO (round 13): use the `_meta`-persisted
                   // calibrated nprobe when the index was refreshed with
                   // a screen-recall target, else the historical 3 — so
                   // a calibrated standing index screens at the knob its
                   // own recall artifact chose, with no caller change
                   eps: Double = 0.99, nprobe: Int = 0, adcTopC: Int = 32,
                   verify: String = "float",
                   maxBatchRows: Long = 100000L): DataFrame = {
    val np = if (nprobe > 0) nprobe
             else pqScreenNprobeOf(s, table).getOrElse(3)
    val nB = batch.count()
    require(nB <= maxBatchRows,
      s"probePqIndex broadcasts its batch's ADC LUTs, and $nB batch rows " +
        s"exceed maxBatchRows=$maxBatchRows — for corpus-sized probes use " +
        "the bucketed semantic probe (Ann.probeSemanticIndex), or raise " +
        "maxBatchRows deliberately.")
    val best = pqTopK(s, table, batch, k = 1, np, adcTopC, verify)
      .select(col("q_id"), col("n_id").as("match_vec_id"), col("cosine"))
    // every batch vector's own cell (rank-1 probe) for the report shape
    val centroids = centroidsOf(s, table)
    // both right sides are batch-bounded — broadcast them so the final
    // assembly never sorts (a SortMergeJoin here would shuffle the batch
    // twice for two ≤|batch|-row lookups)
    val ownCell = assignCellsLean(batch, centroids).select("vec_id", "cell")
    batch.select("vec_id").join(broadcast(ownCell), Seq("vec_id"), "left")
      .join(broadcast(best.withColumnRenamed("q_id", "vec_id")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("match_vec_id"), col("cosine"),
        coalesce((col("cosine") >= eps).cast("int"), lit(0)).as("is_dup"))
      .orderBy("vec_id")
  }

  /** q112: the IVF-PQ admission probe as a SELF-CONTAINED oracle query —
    * q97's scenario (a batch of re-encodes that must flag and inversions
    * that must pass) served by the q110 read path instead of the sign-
    * band index: each batch vector probes its nprobe nearest cells, ADC
    * ranks the in-cell candidates on 4-byte codes, the ADC top-C rerank
    * verifies on exact decimal cosines, and the best survivor decides
    * `is_dup` at eps. One row per batch vector (null match for a vector
    * whose probed cells are empty). The production form is
    * [[probePqIndex]] over a [[refreshPqIndex]] table — this query
    * rebuilds the same state inline so DuckDB can replay every stage
    * (centroids, codes, codebook, LUT, ADC ranking, exact rerank)
    * bit-for-bit; it is the value oracle the PQ probe's module tests
    * anchor to.
    */
  def q112PqProbe(s: SparkSession, dir: String, eps: Double = 0.99,
                  nprobe: Int = 3, adcTopC: Int = 32): DataFrame = {
    val (res, pins) = q112Lazy(s, dir, eps, nprobe, adcTopC)
    // the result is batch-sized (one row per batch vector): pin IT
    // eagerly — which also evaluates every consumer of the three
    // persisted state frames — so the finally can free those pins
    // INSIDE the query (VERDICT r10 #1: the in-query persists used to
    // outlive the query for the rest of a 123-query suite run; now the
    // only blocks that survive are the batch-sized result's own, and
    // the Verify/Bench/OneQ harnesses sweep those after consuming it).
    // The admission cycle's freePinned discipline, applied to the
    // oracle twin. PlanSpec asserts the UNPINNED plan ([[q112Lazy]]) —
    // a checkpointed frame plans as a bare RDD scan.
    try res.localCheckpoint(true)
    finally pins.foreach(_.unpersist(false))
  }

  /** q112's lazy plan + its three pinned state frames — the probe body
    * without the eager pin, so PlanSpec can assert the join shapes.
    */
  private[graft] def q112Lazy(s: SparkSession, dir: String,
                              eps: Double = 0.99, nprobe: Int = 3,
                              adcTopC: Int = 32): (DataFrame, Seq[DataFrame]) = {
    val e = embeddings(s, dir) // CPU-spread at the loader (round 18)
    // the inline standing state is consumed by several stages (ADC scan,
    // rerank scan, probes, LUT, own-cell assignment) — persist it the
    // way semDedupFrames persists its members, so consumers share one
    // computation instead of re-running the centroid/codebook corpus
    // passes (at sf0.1 the query is candidate-bound — its 467-vector
    // batch is 9× q110's query load, the band-vs-PQ probe trade PLANS.md
    // prices — but at larger corpora the saved passes compound). The
    // table-backed path (probePqIndex) reads materialized state instead
    // and needs no persist.
    val centroids = centroidTable(e).persist()
    val members = assignCellsLean(e, centroids)
      .select(col("vec_id"), pqCodesCol.as("codes"), col("emb"), col("cell"))
      .persist()
    // no codebook persist since round 18: with the LUT fusion in
    // pqTopKFrames the LUT is the codebook's only consumer
    val codebook = pqCodebook(pqComps(pqCoded(e.select(col("vec_id"), col("emb")))))
    // q97's batch: re-encodes (must flag at cosine 1) + inversions
    // (must pass — their best exact cosine is far below eps)
    val batch = e.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 40000).as("vec_id"),
        expr("transform(emb, x -> x * 0.99)").as("emb"))
      .unionByName(e.filter(col("vec_id") % 11 === 0)
        .select((col("vec_id") + 50000).as("vec_id"),
          expr("transform(emb, x -> -x)").as("emb")))
    // ONE coarse ranking serves both the nprobe restriction and the
    // report's own-cell column (round 17 — the rn = 1 row IS the argmax
    // assignment, same (csim desc, cell) order as assignCellsLean)
    val ranked = pqProbeRanked(batch, centroids, nprobe).persist()
    val best = pqTopKFrames(members, centroids, codebook, batch,
        k = 1, nprobe, adcTopC, verify = "dec", probesOpt = Some(ranked))
      .select(col("q_id"), col("n_id").as("match_vec_id"), col("cosine"))
    // both right sides are batch-bounded — broadcast them so the final
    // assembly never sorts (a SortMergeJoin here would shuffle the batch
    // twice for two ≤|batch|-row lookups)
    val ownCell = ranked.filter(col("rn") === 1)
      .select(col("q_id").as("vec_id"), col("cell"))
    val res = batch.select("vec_id")
      .join(broadcast(ownCell), Seq("vec_id"), "left")
      .join(broadcast(best.withColumnRenamed("q_id", "vec_id")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("match_vec_id"), col("cosine"),
        coalesce((col("cosine") >= eps).cast("int"), lit(0)).as("is_dup"))
      .orderBy("vec_id")
    (res, Seq(members, centroids, ranked))
  }

  val q112Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |be AS (
       |  SELECT vec_id + 40000 AS vec_id,
       |    list_transform(emb, x -> x * 0.99) AS emb
       |  FROM e WHERE vec_id % 7 = 0
       |  UNION ALL
       |  SELECT vec_id + 50000, list_transform(emb, x -> -x)
       |  FROM e WHERE vec_id % 11 = 0),
       |expl AS (
       |  SELECT vec_id, label, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM e),
       |bexpl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM be),
       |-- coarse stage (q110's CTEs): label-seeded decimal-exact centroids;
       |-- corpus argmax cell; batch nprobe cells
       |cent AS (
       |  SELECT label AS cell, j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq
       |  FROM expl GROUP BY 1, 2),
       |cnorm AS (SELECT cell, SUM(cq * cq) AS n2 FROM cent GROUP BY 1),
       |vdots AS (
       |  SELECT x.vec_id, ct.cell,
       |    SUM(CAST(FLOOR(x.v * $QScale) AS BIGINT) * ct.cq) AS dvc
       |  FROM expl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |vqn AS (
       |  SELECT vec_id,
       |    SUM(CAST(FLOOR(v * $QScale) AS BIGINT) * CAST(FLOOR(v * $QScale) AS BIGINT)) AS qn2
       |  FROM expl GROUP BY 1),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT d.vec_id, d.cell,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
       |        CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) DESC, d.cell) AS rn
       |    FROM vdots d JOIN cnorm c ON c.cell = d.cell
       |    JOIN vqn q ON q.vec_id = d.vec_id) t
       |  WHERE rn = 1),
       |bdots AS (
       |  SELECT x.vec_id, ct.cell,
       |    SUM(CAST(FLOOR(x.v * $QScale) AS BIGINT) * ct.cq) AS dvc
       |  FROM bexpl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |bqn AS (
       |  SELECT vec_id,
       |    SUM(CAST(FLOOR(v * $QScale) AS BIGINT) * CAST(FLOOR(v * $QScale) AS BIGINT)) AS qn2
       |  FROM bexpl GROUP BY 1),
       |branked AS (
       |  SELECT d.vec_id, d.cell,
       |    ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
       |      CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) DESC, d.cell) AS rn
       |  FROM bdots d JOIN cnorm c ON c.cell = d.cell
       |  JOIN bqn q ON q.vec_id = d.vec_id),
       |owncell AS (SELECT vec_id, cell FROM branked WHERE rn = 1),
       |probes AS (SELECT vec_id AS q_id, cell FROM branked WHERE rn <= 3),
       |-- PQ stage (q109's CTEs over the CORPUS): sign codes, decimal
       |-- codebook; the batch side only builds its integer LUT
       |sv AS (
       |  SELECT vec_id, j // $PqSubDim AS sub, j % $PqSubDim AS jj, v FROM expl),
       |codes AS (
       |  SELECT vec_id, sub,
       |    CAST(SUM(CASE WHEN jj < $PqSignBits AND v >= 0 THEN 1 << jj ELSE 0 END) AS INT) AS code
       |  FROM sv GROUP BY 1, 2),
       |cb AS (
       |  SELECT s.sub, c.code, s.jj,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(s.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000000.0) AS BIGINT) AS cw
       |  FROM sv s JOIN codes c ON c.vec_id = s.vec_id AND c.sub = s.sub
       |  GROUP BY 1, 2, 3),
       |cbn AS (SELECT sub, code, SUM(cw * cw) AS n2 FROM cb GROUP BY 1, 2),
       |bsv AS (
       |  SELECT vec_id AS q_id, j // $PqSubDim AS sub, j % $PqSubDim AS jj,
       |    CAST(FLOOR(v * 10000000.0) AS BIGINT) AS qv
       |  FROM bexpl),
       |lqn AS (SELECT q_id, SUM(qv * qv) AS qnorm2 FROM bsv GROUP BY 1),
       |lut AS (
       |  SELECT b.q_id, cb.sub, cb.code, SUM(b.qv * cb.cw) AS d
       |  FROM bsv b JOIN cb ON cb.sub = b.sub AND cb.jj = b.jj
       |  GROUP BY 1, 2, 3),
       |cands AS (
       |  SELECT p.q_id, a.vec_id, a.cell
       |  FROM probes p JOIN assigned a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.q_id),
       |adc AS (
       |  SELECT c.q_id, c.vec_id, c.cell, SUM(l.d) AS dot, SUM(n.n2) AS recon2
       |  FROM cands c
       |  JOIN codes k ON k.vec_id = c.vec_id
       |  JOIN lut l ON l.q_id = c.q_id AND l.sub = k.sub AND l.code = k.code
       |  JOIN cbn n ON n.sub = k.sub AND n.code = k.code
       |  GROUP BY 1, 2, 3),
       |short AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT a.q_id, a.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY a.q_id ORDER BY
       |        ${Num.sqlRoundD("CAST(a.dot AS DOUBLE) / SQRT(CAST(q.qnorm2 AS DOUBLE) * CAST(a.recon2 AS DOUBLE))")} DESC,
       |        a.vec_id) AS rn
       |    FROM adc a JOIN lqn q USING (q_id)) t
       |  WHERE rn <= 32),
       |-- exact decimal rerank of the survivors only (q97's pair cosine)
       |pdots AS (
       |  SELECT s.q_id, s.vec_id, SUM(CAST(qa.v * qb.v AS DECIMAL(25,12))) AS dotp
       |  FROM short s
       |  JOIN bexpl qa ON qa.vec_id = s.q_id
       |  JOIN expl qb ON qb.vec_id = s.vec_id AND qb.j = qa.j
       |  GROUP BY 1, 2),
       |bn AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2 FROM bexpl GROUP BY 1),
       |vn AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(25,12))) AS n2 FROM expl GROUP BY 1),
       |best AS (
       |  SELECT q_id, vec_id AS match_vec_id, cosine FROM (
       |    SELECT d.q_id, d.vec_id,
       |      ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))")} AS cosine,
       |      ROW_NUMBER() OVER (PARTITION BY d.q_id ORDER BY
       |        ${Num.sqlRoundD("CAST(d.dotp AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))")} DESC,
       |        d.vec_id) AS rn
       |    FROM pdots d
       |    JOIN bn na ON na.vec_id = d.q_id
       |    JOIN vn nb ON nb.vec_id = d.vec_id) t
       |  WHERE rn = 1)
       |SELECT b.vec_id, o.cell, t.match_vec_id, t.cosine,
       |  CASE WHEN t.cosine >= 0.99 THEN 1 ELSE 0 END AS is_dup
       |FROM (SELECT vec_id FROM be) b
       |LEFT JOIN owncell o ON o.vec_id = b.vec_id
       |LEFT JOIN best t ON t.q_id = b.vec_id
       |ORDER BY b.vec_id""".stripMargin

  /** Recall@k of standing PQ indexes against the exact brute-force
    * baseline — q98's artifact for the MATERIALIZED family, and the
    * gate that grades the trained (k-means) quantizer against the
    * deterministic one (VERDICT r10 #1): one row per `indexes` entry
    * (index_type → table), recall = fraction of the true top-k each
    * index's serving path returned over the corpus' own `nQueries`
    * query prefix. All ranking on 4dp decimal cosines with (desc, id)
    * ties, so the report is deterministic.
    */
  def pqRecallByIndex(s: SparkSession, dir: String,
                      indexes: Seq[(String, String)],
                      k: Int = 10, nQueries: Int = 50,
                      nprobe: Int = 3, adcTopC: Int = 32): DataFrame = {
    val exact = q25AnnBruteforce(s, dir, nQueries)
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), lit(1).as("hit"))
    val queries = embeddings(s, dir).filter(col("vec_id") < nQueries)
      .select("vec_id", "emb")
    val served = indexes.map { case (indexType, table) =>
      searchPqIndex(s, table, queries, k, nprobe, adcTopC, verify = "dec")
        .select(lit(indexType).as("index_type"), col("q_id"), col("n_id"))
    }.reduce(_ unionByName _)
    served
      .join(broadcast(exact), Seq("q_id", "n_id"), "left")
      .groupBy("index_type")
      .agg(
        sum(coalesce(col("hit"), lit(0))).as("hits"),
        Num.roundD(sum(coalesce(col("hit"), lit(0))).cast("double") /
          lit(nQueries * k).cast("double")).as("recall_at_k"))
      .orderBy("index_type")
  }

  /** q125: ONE spherical-Lloyd refinement round of the COARSE IVF
    * centroids as a SELF-CONTAINED oracle query — q124's twin for the
    * other half of the trained quantizer ([[centroidTableKmeans]]):
    * start from the label-seeded decimal-exact centroids (q81's, the
    * oracle contract), re-assign every corpus vector by argmax cosine
    * against them (exact integer dots, ties to the lower cell — the
    * [[assignCellsLean]] kernel q112 already value-anchors), and
    * recompute each surviving cell's centroid as the decimal-exact mean
    * of its assigned members. Output per surviving cell: member count,
    * how many members arrived from a DIFFERENT seed label (the argmax
    * migration the training exists to capture), the exact integer
    * squared drift of the quantized centroid, and the init/trained
    * centroid norms. One assignment pass + two centroid-sized
    * aggregates; [[centroidTableKmeans]] runs exactly this round
    * `iters` times.
    */
  def q125IvfLloydRound(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir)
    val cents0 = centroidTable(e)
    val assigned = assignCellsLean(e, cents0)
    val cents1 = centroidMeans(assigned, col("cell"))
    val stats = assigned
      .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("label") === col("cell"), 1L).otherwise(0L))
          .as("n_from_seed"))
    cents1.select(col("cell"), col("qcent").as("q1"),
        col("cnorm2").as("cnorm2_trained"))
      .join(broadcast(cents0.select(col("cell"), col("qcent").as("q0"),
        col("cnorm2").as("cnorm2_init"))), Seq("cell"))
      .withColumn("drift2", expr(
        "aggregate(zip_with(q1, q0, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .join(broadcast(stats), Seq("cell"))
      .select(col("cell"), col("n_members"), col("n_from_seed"),
        (col("n_members") - col("n_from_seed")).as("n_moved_in"),
        col("drift2"), col("cnorm2_init"), col("cnorm2_trained"))
      .orderBy("cell")
  }

  val q125Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |expl AS (
       |  SELECT vec_id, label, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM e),
       |cent AS (
       |  SELECT label AS cell, j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq
       |  FROM expl GROUP BY 1, 2),
       |cnorm AS (SELECT cell, SUM(cq * cq) AS n2 FROM cent GROUP BY 1),
       |vdots AS (
       |  SELECT x.vec_id, ct.cell,
       |    SUM(CAST(FLOOR(x.v * $QScale) AS BIGINT) * ct.cq) AS dvc
       |  FROM expl x JOIN cent ct ON x.j = ct.j
       |  GROUP BY 1, 2),
       |vqn AS (
       |  SELECT vec_id,
       |    SUM(CAST(FLOOR(v * $QScale) AS BIGINT) * CAST(FLOOR(v * $QScale) AS BIGINT)) AS qn2
       |  FROM expl GROUP BY 1),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT d.vec_id, d.cell,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
       |        CAST(d.dvc AS DOUBLE) / SQRT(CAST(c.n2 AS DOUBLE) * CAST(q.qn2 AS DOUBLE)) DESC, d.cell) AS rn
       |    FROM vdots d JOIN cnorm c ON c.cell = d.cell
       |    JOIN vqn q ON q.vec_id = d.vec_id) t
       |  WHERE rn = 1),
       |cent1 AS (
       |  SELECT a.cell, x.j,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(x.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * $QScale) AS BIGINT) AS cq1
       |  FROM expl x JOIN asg a ON a.vec_id = x.vec_id
       |  GROUP BY 1, 2),
       |cnorm1 AS (SELECT cell, SUM(cq1 * cq1) AS n2t FROM cent1 GROUP BY 1),
       |drift AS (
       |  SELECT c1.cell, SUM((c1.cq1 - c0.cq) * (c1.cq1 - c0.cq)) AS drift2
       |  FROM cent1 c1 JOIN cent c0 ON c0.cell = c1.cell AND c0.j = c1.j
       |  GROUP BY 1),
       |st AS (
       |  SELECT a.cell, COUNT(*) AS n_members,
       |    CAST(SUM(CASE WHEN e.label = a.cell THEN 1 ELSE 0 END) AS BIGINT) AS n_from_seed
       |  FROM asg a JOIN e ON e.vec_id = a.vec_id
       |  GROUP BY 1)
       |SELECT st.cell, st.n_members, st.n_from_seed,
       |  st.n_members - st.n_from_seed AS n_moved_in,
       |  CAST(drift.drift2 AS BIGINT) AS drift2,
       |  CAST(c0.n2 AS BIGINT) AS cnorm2_init,
       |  CAST(c1.n2t AS BIGINT) AS cnorm2_trained
       |FROM st
       |JOIN drift ON drift.cell = st.cell
       |JOIN cnorm c0 ON c0.cell = st.cell
       |JOIN cnorm1 c1 ON c1.cell = st.cell
       |ORDER BY st.cell""".stripMargin

  /** q124: ONE Lloyd refinement round of the PQ codebook as a
    * SELF-CONTAINED oracle query — the value anchor of the TRAINED
    * quantizer family ([[pqCodebookKmeans]], q113's discipline applied
    * to vector quantization): start from the sign-bucket init codebook
    * (q109's), re-assign every (vector, subspace) to its NEAREST
    * codeword by exact integer squared distance (ties to the lower
    * code), and recompute each surviving codeword as the decimal-exact
    * mean of its assigned members. Output: one row per refined
    * (sub, code, jj) with the init and trained codeword values, the
    * member count, and the mean squared distance before/after the
    * update — mse_trained ≤ mse_init per codeword is Lloyd's descent
    * property, oracle-visible. DuckDB replays every stage bit-for-bit
    * because assignment is integer argmin and the update is the
    * [[pqCodebook]] decimal mean.
    *
    * Scale shape: the assignment is one partial-aggregated pass over
    * (vectors × 64 components × 16 codewords of their subspace) against
    * a BROADCAST 1 024-row codebook; everything else aggregates to
    * codebook-sized frames. [[pqCodebookKmeans]] runs exactly this
    * round `iters` times.
    */
  def q124PqKmeansRound(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).select(col("vec_id"), col("emb"))
    val qcomps = pqQComps(e)
    val cb0 = pqCodebook(pqComps(pqCoded(e)))
    val assign = pqNearestAssign(qcomps, cb0)
    val cb1 = pqMeansFor(qcomps, assign)
    val nm = assign.groupBy("sub", "code")
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("sse_init"))
    val d2 = qcomps
      .join(assign.select("vec_id", "sub", "code"), Seq("vec_id", "sub"))
      .join(broadcast(cb1.select(col("sub"), col("code"), col("jj"),
        col("cw").as("cw1"))), Seq("sub", "code", "jj"))
      .groupBy("sub", "code")
      .agg(sum((col("qv") - col("cw1")) * (col("qv") - col("cw1"))).as("sse_trained"))
    cb1.select(col("sub"), col("code"), col("jj"), col("cw").as("cw_trained"))
      .join(broadcast(cb0.select(col("sub"), col("code"), col("jj"),
        col("cw").as("cw_init"))), Seq("sub", "code", "jj"))
      .join(broadcast(nm), Seq("sub", "code"))
      .join(broadcast(d2), Seq("sub", "code"))
      .select(col("sub").cast("int").as("sub"),
        col("code").cast("int").as("code"),
        col("jj").cast("int").as("jj"),
        col("cw_init"), col("cw_trained"), col("n_members"),
        Num.roundD(col("sse_init").cast("double") / col("n_members")).as("mse_init"),
        Num.roundD(col("sse_trained").cast("double") / col("n_members")).as("mse_trained"))
      .orderBy("sub", "code", "jj")
  }

  val q124Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |expl AS (
       |  SELECT vec_id, generate_subscripts(emb, 1) - 1 AS j, unnest(emb) AS v
       |  FROM e),
       |sv AS (
       |  SELECT vec_id, j // $PqSubDim AS sub, j % $PqSubDim AS jj, v FROM expl),
       |codes AS (
       |  SELECT vec_id, sub,
       |    CAST(SUM(CASE WHEN jj < $PqSignBits AND v >= 0 THEN 1 << jj ELSE 0 END) AS INT) AS code
       |  FROM sv GROUP BY 1, 2),
       |cb AS (
       |  SELECT s.sub, c.code, s.jj,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(s.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000000.0) AS BIGINT) AS cw
       |  FROM sv s JOIN codes c ON c.vec_id = s.vec_id AND c.sub = s.sub
       |  GROUP BY 1, 2, 3),
       |q AS (
       |  SELECT vec_id, sub, jj, CAST(FLOOR(v * 10000000.0) AS BIGINT) AS qv
       |  FROM sv),
       |dist AS (
       |  SELECT q.vec_id, q.sub, cb.code,
       |    SUM((q.qv - cb.cw) * (q.qv - cb.cw)) AS dist
       |  FROM q JOIN cb ON cb.sub = q.sub AND cb.jj = q.jj
       |  GROUP BY 1, 2, 3),
       |asg AS (
       |  SELECT vec_id, sub, code, dist FROM (
       |    SELECT vec_id, sub, code, dist,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
       |    FROM dist) t
       |  WHERE rn = 1),
       |cb1 AS (
       |  SELECT s.sub, a.code, s.jj,
       |    CAST(FLOOR(CAST(CAST(SUM(CAST(s.v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000000.0) AS BIGINT) AS cw_trained
       |  FROM sv s JOIN asg a ON a.vec_id = s.vec_id AND a.sub = s.sub
       |  GROUP BY 1, 2, 3),
       |nm AS (
       |  SELECT sub, code, COUNT(*) AS n_members, SUM(dist) AS sse_init
       |  FROM asg GROUP BY 1, 2),
       |d2 AS (
       |  SELECT q.sub, a.code,
       |    SUM((q.qv - c.cw_trained) * (q.qv - c.cw_trained)) AS sse_trained
       |  FROM q
       |  JOIN asg a ON a.vec_id = q.vec_id AND a.sub = q.sub
       |  JOIN cb1 c ON c.sub = q.sub AND c.code = a.code AND c.jj = q.jj
       |  GROUP BY 1, 2)
       |SELECT CAST(c.sub AS INT) AS sub, CAST(c.code AS INT) AS code,
       |  CAST(c.jj AS INT) AS jj,
       |  cb.cw AS cw_init, c.cw_trained, nm.n_members,
       |  ${Num.sqlRoundD("CAST(nm.sse_init AS DOUBLE) / nm.n_members")} AS mse_init,
       |  ${Num.sqlRoundD("CAST(d2.sse_trained AS DOUBLE) / nm.n_members")} AS mse_trained
       |FROM cb1 c
       |JOIN cb ON cb.sub = c.sub AND cb.code = c.code AND cb.jj = c.jj
       |JOIN nm ON nm.sub = c.sub AND nm.code = c.code
       |JOIN d2 ON d2.sub = c.sub AND d2.code = c.code
       |ORDER BY 1, 2, 3""".stripMargin
}
