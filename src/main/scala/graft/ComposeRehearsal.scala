package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end composition rehearsal (round 12): the FULL Curate ladder —
  * heuristic quality gate, model gate at a target precision, ExactSubstr
  * cut, exact + near-dup keep-best, SemDeDup, benchmark decontamination,
  * split + pack, training-order manifest, BPE tokenizer, standing-index
  * handoff — followed by TWO day-2 admission cycles against exactly the
  * tables the handoff shipped, serialized under the same lock the
  * handoff took (`--admit-dir` wiring). This is the
  * switch-and-run-everything claim as ONE timed, reproducible main: a
  * user of the reference curates once, then admits forever, and every
  * stage in between is the production configuration.
  *
  * Batch 1 is genuinely novel ([[AdmitRehearsal]]'s replica transforms
  * at a fresh key) — the cycle pays both probes, both appends, and the
  * landing. Batch 2 mixes RE-SUBMISSIONS of shipped text (must
  * exact-reject — round 13's standing hash screen; pre-r13 these were
  * the band probe's catch) and re-encodes of shipped vectors (must
  * PQ-reject at the calibrated nprobe) with a novel remainder — the
  * screens bite against the handoff's tables, proving the composition
  * end to end. Phase 4 (round 13) then prices the STREAMING twin: one
  * 10,000-doc micro-batch (novel + re-submission + re-encode mix)
  * through [[graft.streaming.EventStreams.admissionQuery]] against the
  * same standing state, and the persisted reportHistory (lock_healthy,
  * exact_rejected, lock_wait_ms included) is read back as the final
  * artifact.
  *
  * Prints one JSON line with per-phase wall seconds and the admission
  * accounting. Usage: `runMain graft.ComposeRehearsal <sfDir>`
  */
object ComposeRehearsal {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scratch = java.nio.file.Files.createTempDirectory("compose-rehearsal")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val curatedDir = s"$scratch/curated"
    val admitOut = s"$scratch/ingest"

    // phase 1: curate with EVERY stage on; the handoff serializes on the
    // admission landing dir's lock (the composed contract)
    val (summary, tCurate) = timed(Curate.run(spark, sfDir, curatedDir,
      substringCut = true, semanticDedup = true, trainManifest = true,
      classifierTargetPrecision = 0.85, bpeMerges = 64,
      refreshIndexes = true, admitLockDir = admitOut))

    val shipped = spark.read.parquet(s"$curatedDir/corpus")
      .select("doc_id", "text")
    val shippedVecs = Tables.load(spark, sfDir, "embeddings")
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .join(shipped.select(col("doc_id").as("vec_id")), "vec_id")
      .select("vec_id", "emb")
    val recovery = Some(Admit.Standing(shipped, Some(shippedVecs)))

    // phase 2: a NOVEL batch (AdmitRehearsal's replica transforms, fresh
    // key 778) — pays both probes, both appends, and the landing
    val src1 = shipped.orderBy("doc_id").limit(1000)
    val b1 = src1
      .withColumn("doc_id", col("doc_id") + 778000000L)
      .withColumn("text", expr(
        "array_join(transform(array_sort(transform(split(text, ' '), " +
          "t -> struct(xxhash64(t, doc_id, 778) AS h, t AS t))), x -> x.t), ' ')"))
    val b1v = shippedVecs
      .join(src1.select(col("doc_id").as("vec_id")), "vec_id")
      .withColumn("vec_id", col("vec_id") + 778000000L)
      .withColumn("emb", expr(
        "transform(emb, (x, j) -> CAST(x * (CASE WHEN " +
          "(xxhash64('flip', 778, j) & 1) = 1 THEN -1.0 ELSE 1.0 END) AS DOUBLE))"))
    val (r1, tAdmit1) = timed(Admit.admitBatch(spark, b1, "curated_band",
      admitOut, 1L, embeddings = Some(b1v), pqTable = Some("curated_pq"),
      recovery = recovery, textTable = Some("curated_text")))

    // phase 3: the screens must BITE — 200 re-submissions of shipped
    // text (band-reject) + 100 re-encodes of shipped vectors under new
    // text (PQ-reject) + 100 genuinely novel docs (admit). Re-encode
    // sources must be shipped docs that HAVE embedding rows (the
    // embeddings table covers the low doc_id range), or the PQ screen
    // never sees them — absence is not evidence, the Curate convention
    val eligible = shipped
      .join(shippedVecs.select(col("vec_id").as("doc_id")), "doc_id")
    val resub = shipped.orderBy("doc_id").limit(200)
      .withColumn("doc_id", col("doc_id") + 779000000L)
    val reencSrc = eligible.orderBy(col("doc_id").desc).limit(100)
    val reenc = reencSrc
      .withColumn("doc_id", col("doc_id") + 779500000L)
      .withColumn("text", expr(
        "array_join(transform(array_sort(transform(split(text, ' '), " +
          "t -> struct(xxhash64(t, doc_id, 779) AS h, t AS t))), x -> x.t), ' ')"))
    val reencVecs = shippedVecs
      .join(reencSrc.select(col("doc_id").as("vec_id")), "vec_id")
      .withColumn("vec_id", col("vec_id") + 779500000L)
      .withColumn("emb", expr("transform(emb, x -> x * 0.99)"))
    val novelSrc = eligible.orderBy("doc_id").limit(1100)
      .orderBy(col("doc_id").desc).limit(100)
    val novel = novelSrc
      .withColumn("doc_id", col("doc_id") + 779800000L)
      .withColumn("text", expr(
        "array_join(transform(array_sort(transform(split(text, ' '), " +
          "t -> struct(xxhash64(t, doc_id, 780) AS h, t AS t))), x -> x.t), ' ')"))
    val novelVecs = shippedVecs
      .join(novelSrc.select(col("doc_id").as("vec_id")), "vec_id")
      .withColumn("vec_id", col("vec_id") + 779800000L)
      .withColumn("emb", expr(
        "transform(emb, (x, j) -> CAST(x * (CASE WHEN " +
          "(xxhash64('flip', 780, j) & 1) = 1 THEN -1.0 ELSE 1.0 END) AS DOUBLE))"))
    // round 16 — the punctuated class (VERDICT r15 #1): 100 shipped docs
    // re-submitted with every space rewritten `", "` — q152's adversarial
    // construction. Pre-r16 this slipped the exact AND band screens; the
    // handoff's robust-mode index must exact-reject every one
    // sources disjoint from the resub slice, so each punct copy is the
    // ONLY representative of its content inside the batch and the
    // rejection is attributable to the STANDING exact screen (a shared
    // source would collapse at the intra screen first)
    val punct = shipped.orderBy("doc_id").limit(300)
      .orderBy(col("doc_id").desc).limit(100)
      .withColumn("doc_id", col("doc_id") + 779900000L)
      .withColumn("text", regexp_replace(col("text"), " ", ", "))
    val b2 = resub.unionByName(reenc).unionByName(novel).unionByName(punct)
    val b2v = reencVecs.unionByName(novelVecs)
    val (r2, tAdmit2) = timed(Admit.admitBatch(spark, b2, "curated_band",
      admitOut, 2L, embeddings = Some(b2v), pqTable = Some("curated_pq"),
      recovery = recovery, textTable = Some("curated_text")))

    // phase 4 (round 13 — VERDICT r12 #6): the STREAMING admission twin,
    // timed at the same standing state — one ≥10k-doc micro-batch (the
    // r11 sizing guidance) through EventStreams.admissionQuery, which
    // runs the identical admitBatch cycle per micro-batch under the same
    // lock and GROWS the same indexes. Composition: 9,300 novel docs
    // (deterministic word permutations of shipped text at a fresh key),
    // 500 verbatim re-submissions (the exact screen must bite), and 200
    // re-encodes of shipped vectors under novel text (the PQ screen must
    // bite at its calibrated nprobe).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val srcTexts = shipped.orderBy("doc_id")
      .limit(4000).select("doc_id", "text")
      .as[(Long, String)].collect()
    def permuted(text: String, salt: Long): String =
      text.split(' ').sortBy(w =>
        scala.util.hashing.MurmurHash3.stringHash(s"$w#$salt")).mkString(" ")
    val novelRows = (0 until 9300).map { i =>
      val (_, t) = srcTexts(i % srcTexts.length)
      (781000000L + i, permuted(t, 781L * i))
    }
    val resubRows = (0 until 500).map { i =>
      (782000000L + i, srcTexts(i % srcTexts.length)._2)
    }
    // the punctuated class rides the STREAM too (round 16): 200
    // `word, word,` re-submissions — must exact-reject per micro-batch
    val punctRows = (0 until 200).map { i =>
      (784000000L + i, srcTexts(i % srcTexts.length)._2.split(' ').mkString(", "))
    }
    val reencSrc2 = eligible.orderBy(col("doc_id").desc)
      .limit(200).select("doc_id", "text").as[(Long, String)].collect()
    val reencRows = reencSrc2.zipWithIndex.map { case ((id, t), i) =>
      (783000000L + id, permuted(t, 783L * (i + 1)))
    }.toSeq
    val reencVecs2 = shippedVecs
      .join(reencSrc2.map(_._1).toSeq.toDF("vec_id"), "vec_id")
      .withColumn("vec_id", col("vec_id") + 783000000L)
      .withColumn("emb", expr("transform(emb, x -> x * 0.99)"))
    val streamRows = novelRows ++ resubRows ++ reencRows ++ punctRows
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val ckpt = s"$scratch/stream-ckpt"
    val q = graft.streaming.EventStreams.admissionQuery(
      input.toDF.toDF("doc_id", "text"), "curated_band", admitOut, ckpt,
      embeddings = Some(reencVecs2), pqTable = Some("curated_pq"),
      recovery = recovery, textTable = Some("curated_text"))
    input.addData(streamRows)
    val tStream: Double = timed { q.processAllAvailable() }._2
    q.stop()
    val sRep = Admit.reportHistory(spark, admitOut)
      .filter(col("batch_id") === 0).collect().head

    // the consumable history, lock_healthy included (the r12 bit)
    val hist = Admit.reportHistory(spark, admitOut).collect()
    val healthy = hist.forall(_.getAs[Boolean]("lock_healthy"))

    // the standing BM25 index rode every phase (round 14 third pass):
    // one handoff refresh + one append per ADMITTING cycle, and the
    // admitted corpus is retrieval-servable right here
    val textPhys = graft.sources.TablePointer.resolve(spark, "curated_text")
    val textCommits = spark.table(s"${textPhys}_meta").count()
    val textDocs = spark.table(s"${textPhys}_meta")
      .agg(sum("n_docs")).head().getLong(0)

    println(s"""{"sf":"$sfDir","input":${summary.input},""" +
      s""""shipped":${summary.packed},"indexed":${summary.indexedDocs},""" +
      s""""bpe_merges":${summary.bpeMergesLearned},""" +
      s""""curate_s":${f"$tCurate%.1f"},""" +
      s""""admit1_s":${f"$tAdmit1%.1f"},"admit1_admitted":${r1.admitted},""" +
      s""""admit2_s":${f"$tAdmit2%.1f"},"admit2_admitted":${r2.admitted},""" +
      s""""admit2_exact_rej":${r2.exactRejected},""" +
      s""""admit2_near_rej":${r2.nearDupRejected},""" +
      s""""admit2_sem_rej":${r2.semanticRejected},""" +
      s""""admit2_intra_rej":${r2.intraRejected},""" +
      s""""stream_docs":${streamRows.length},""" +
      s""""stream_s":${f"$tStream%.1f"},""" +
      s""""stream_admitted":${sRep.getAs[Long]("admitted")},""" +
      s""""stream_exact_rej":${sRep.getAs[Long]("exact_rejected")},""" +
      s""""stream_near_rej":${sRep.getAs[Long]("near_dup_rejected")},""" +
      s""""stream_sem_rej":${sRep.getAs[Long]("semantic_rejected")},""" +
      s""""stream_intra_rej":${sRep.getAs[Long]("intra_rejected")},""" +
      s""""history_rows":${hist.length},"lock_healthy_all":$healthy,""" +
      s""""text_commits":$textCommits,"text_docs":$textDocs}""")
    spark.stop()
  }
}
