package graft

import graft.operators.{Curation, Sampling}
import org.apache.spark.sql.functions._

/** Value and plan assertions for the sampling/curation family
  * (q47–q53): split determinism and stability, stratified cap
  * enforcement with WindowGroupLimit, mixing-rate arithmetic, packing
  * invariants, decontamination on a corpus with known overlap, and PII
  * redaction on injected strings (the synthetic corpus carries no PII,
  * so the regex mechanics are proven here, not by the oracle).
  */
class SamplingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("q47 split is deterministic, complete, and ~80/10/10") {
    val out = Sampling.q47SplitAssign(spark, Sf)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet == Set("train", "validation", "test"))
    // hash buckets are uniform: train share within a loose band of 80%
    val trainShare = counts("train").toDouble / total
    assert(trainShare > 0.7 && trainShare < 0.9, s"train share $trainShare")
    // determinism: a second run assigns identical splits
    val again = Sampling.q47SplitAssign(spark, Sf)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("q47 split membership depends only on the id (stability under growth)") {
    // recompute the bucket for a fixed id with the library column on a
    // one-row frame: same value regardless of what else is in the table
    val one = Seq(42L).toDF("doc_id")
      .select(Sampling.bucket100("split", col("doc_id")).as("b"))
      .head().getInt(0)
    val fromTable = Sampling.q47SplitAssign(spark, Sf)
      .filter(col("doc_id") === 42).select("bucket").head().getInt(0)
    assert(one == fromTable)
  }

  test("q48 enforces the per-language cap and plans a WindowGroupLimit") {
    val df = Sampling.q48StratifiedSample(spark, Sf, cap = 7)
    val per = df.groupBy("lang").count().collect()
    assert(per.nonEmpty)
    per.foreach(r => assert(r.getLong(1) <= 7, s"${r.getString(0)} over cap"))
    // rank filter must push into the window as a group-limit so each
    // stratum carries O(cap) state, not O(stratum)
    assert(planString(df).contains("WindowGroupLimit"), "no WindowGroupLimit")
  }

  test("q134 budget sweep: straddles fall with budget, padding identity holds, 512 row equals q50") {
    val rows = Sampling.q134BudgetSweep(spark, Sf).collect()
      .sortBy(_.getAs[Int]("budget"))
    assert(rows.map(_.getAs[Int]("budget")).toSeq == Seq(256, 512, 1024))
    // token mass is budget-independent by construction
    assert(rows.map(_.getAs[Long]("total_tokens")).distinct.length == 1)
    rows.foreach { r =>
      // padding ≡ pack volume minus content — the exact identity
      assert(r.getAs[Long]("padding_tokens") ==
        r.getAs[Long]("n_packs") * r.getAs[Int]("budget") -
          r.getAs[Long]("total_tokens"), r.toString)
    }
    // larger windows can only reduce straddlers and pack count
    val st = rows.map(_.getAs[Long]("straddle_docs"))
    assert(st.zip(st.tail).forall { case (a, b) => b <= a }, st.mkString(","))
    val np = rows.map(_.getAs[Long]("n_packs"))
    assert(np.zip(np.tail).forall { case (a, b) => b <= a }, np.mkString(","))
    // the 512 row is q50's own packing, counted
    val q50Straddles = Sampling.q50PackSequences(spark, Sf).collect()
      .map(_.getAs[Int]("straddles").toLong).sum
    assert(rows(1).getAs[Long]("straddle_docs") == q50Straddles)
  }

  test("q126 priority sample: k per stratum, HT estimate bounded below by w, group-limited plan") {
    val df = Sampling.q126PrioritySample(spark, Sf, k = 8)
    val rows = df.collect()
    val docsPerLang = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      // exactly k rows when the stratum has them, contiguous ranks
      assert(rs.length == math.min(8L, docsPerLang(lang)), s"$lang size")
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length),
        s"$lang ranks")
      // Horvitz–Thompson: each estimate is max(w, tau), so never below w
      rs.foreach { r =>
        assert(r.getAs[Double]("est_w_r") >= r.getAs[Long]("w") - 1e-4, r.toString)
      }
      // rel_err is a per-language constant (the window total), and when
      // the whole stratum fits in the sample the estimate is EXACT
      assert(rs.map(_.getAs[Double]("rel_err_r")).distinct.length == 1, lang)
      if (docsPerLang(lang) <= 8)
        assert(rs.head.getAs[Double]("rel_err_r") == 0.0, s"$lang exact case")
    }
    // the top-(k+1) rank filter must group-limit, O(k) state per stratum
    assert(planString(df).contains("WindowGroupLimit"), "no WindowGroupLimit")
  }

  test("q127 curriculum: boundary-derived stages match a local replay; bands monotone") {
    val rows = Sampling.q127Curriculum(spark, Sf, stages = 5).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    // replay the quantized-boundary arithmetic locally (round 12 — the
    // r11 NTILE's positional ±1 balance is now a tie-block tolerance,
    // so the strongest check is exact agreement with the rule itself):
    // per (lang, qdiff) histogram → stage of a block = which fifth its
    // FIRST doc falls in → expected per-stage doc/token sums
    val local = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect().map { r =>
        val nTok = r.getAs[String]("text").trim.toLowerCase
          .split(" ", -1).length.toLong
        val qdiff = math.floor(
          r.getAs[Number]("n_chars").doubleValue() / nTok * 1e6 + 0.5) / 1e6
        (r.getAs[String]("lang"), qdiff, nTok)
      }
    val expected: Map[(String, Int), (Long, Long)] = local
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((lang, q), ts) => (lang, q, ts.length.toLong, ts.map(_._3).sum) }
      .groupBy(_._1).flatMap { case (lang, blocks) =>
        val langDocs = blocks.map(_._3).sum
        var cumBefore = 0L
        blocks.sortBy(_._2).map { case (_, _, nDocs, nTok) =>
          val stage = math.min(5, (cumBefore * 5 / langDocs).toInt + 1)
          cumBefore += nDocs
          (lang, stage, nDocs, nTok)
        }
      }.groupBy(t => (t._1, t._2))
      .map { case (k, ts) => k -> (ts.map(_._3).sum, ts.map(_._4).sum) }
    assert(rows.map(r => (r.getAs[String]("lang"), r.getAs[Int]("stage")))
      .toSet == expected.keySet, "stage set mismatch vs local replay")
    rows.foreach { r =>
      val (eDocs, eTok) = expected((r.getAs[String]("lang"), r.getAs[Int]("stage")))
      assert(r.getAs[Long]("docs") == eDocs && r.getAs[Long]("stage_tokens") == eTok,
        s"${r.getAs[String]("lang")} stage ${r.getAs[Int]("stage")}")
    }
    byLang.foreach { case (lang, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("stage"))
      // stage sizes sum back to the language's corpus
      assert(ordered.map(_.getAs[Long]("docs")).sum ==
        local.count(_._1 == lang), s"$lang total")
      // easy → hard: stage difficulty bands never go backwards, and
      // quantized-value boundaries never SPLIT a value across stages
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Double]("min_diff_r") > a.getAs[Double]("max_diff_r"),
            s"$lang band overlap")
        case _ =>
      }
      // the last stage completes the language's token mass
      assert(ordered.last.getAs[Double]("cum_frac_r") == 1.0, s"$lang cum")
    }
  }

  test("q136 perplexity curriculum: gibberish lands in the hardest stage, boilerplate in the easiest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length, lower, size, split, trim}
    // a corpus with a KNOWN difficulty order: 30 copies of one highly
    // predictable sentence (every bigram seen 30×), plus two all-hapax
    // gibberish docs the bigram LM has never seen a single pair of
    val dir = java.nio.file.Files.createTempDirectory("ppl-curr").toString
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val rows = (1L to 30L).map(i => (i, "en", common)) ++ Seq(
      (31L, "en", "zxqv kjwu pqnm bbtz yyrw qqak mmzo ttvb ccxd eelf"),
      (32L, "en", "ghhj rrkl oppw uuzx nnvb aaqe ttym ddcf sslw iioz"))
    rows.toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // doc-level staging through the same seam the query composes
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        split(lower(trim(col("text"))), " ").as("w"))
      .withColumn("n_tok", size(col("w")).cast("long"))
    val scored = graft.operators.TextOps
      .bigramAvgNll(d, Seq("doc_id", "lang", "n_tok"))
      .withColumnRenamed("avg_nll", "qdiff")
    val staged = Sampling.curriculumStages(
      scored.select("doc_id", "lang", "n_tok", "qdiff"), 5).collect()
    assert(staged.length == 32)
    val stageOf = staged.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Int]("stage")).toMap
    // the predictable block is the first stage; the gibberish docs take
    // the LAST stage (their every bigram falls to the smoothed floor)
    (1L to 30L).foreach(i => assert(stageOf(i) == 1, s"doc $i: ${stageOf(i)}"))
    assert(stageOf(31L) == 5 && stageOf(32L) == 5, stageOf.toString)

    // and the registered rollup agrees: the hardest stage holds exactly
    // the two gibberish docs and its band sits strictly above stage 1's
    val out = Sampling.q136PplCurriculum(spark, dir).collect()
    val last = out.maxBy(_.getAs[Int]("stage"))
    val first = out.minBy(_.getAs[Int]("stage"))
    assert(last.getAs[Long]("docs") == 2L, last.toString)
    assert(first.getAs[Long]("docs") == 30L, first.toString)
    assert(last.getAs[Double]("min_diff_r") > first.getAs[Double]("max_diff_r"))
    assert(out.map(_.getAs[Long]("docs")).sum == 32L)
  }

  test("curriculumStages properties: every row returns (nulls included), stages in range and monotone in qdiff") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val langs = Seq("aa", "bb", "cc")
      val rows = (1 to 400).map { i =>
        // ~4% null langs (un-identified documents): the totals join in
        // stageBoundaries must be null-safe too, or the whole null
        // language silently vanishes (review r12, second pass)
        val lang: String =
          if (rng.nextInt(25) == 0) null else langs(rng.nextInt(langs.size))
        // quantized difficulties from a SMALL value domain (forces tie
        // blocks) plus ~5% nulls (unscored docs — the r12 contract fix:
        // a null-unsafe join silently dropped exactly these)
        val qdiff: java.lang.Double =
          if (rng.nextInt(20) == 0) null
          else rng.nextInt(12) / 10.0
        (i.toLong, lang, qdiff)
      }
      val d = rows.toDF("doc_id", "lang", "qdiff")
      val staged = Sampling.curriculumStages(d, stages = 5).collect()
      // contract: every input row comes back exactly once, with a stage
      assert(staged.length == rows.length, s"trial $trial row count")
      assert(staged.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
      assert(staged.forall(r => {
        val s = r.getAs[Int]("stage"); s >= 1 && s <= 5
      }), s"trial $trial stage range")
      // within a language, stage is monotone in qdiff and constant per
      // tie block (nulls order first = easiest slot)
      staged.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
        val byVal = rs.groupBy(r => Option(r.getAs[java.lang.Double]("qdiff"))
          .map(_.doubleValue()))
        byVal.foreach { case (v, block) =>
          assert(block.map(_.getAs[Int]("stage")).distinct.length == 1,
            s"trial $trial $lang tie block $v split across stages")
        }
        val ordered = byVal.toSeq.sortBy(_._1.getOrElse(Double.NegativeInfinity))
          .map(_._2.head.getAs[Int]("stage"))
        assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
          s"trial $trial $lang stages not monotone in qdiff")
      }
    }
  }

  test("q139 length buckets: rows equal a local replay and bucketing beats the one-bucket baseline") {
    val rows = Sampling.q139LengthBuckets(spark, Sf).collect()
    // local replay of the whole report: per-doc token counts → caps →
    // exact per-bucket aggregates and padding arithmetic
    val caps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
    val toks = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).trim.toLowerCase.split(" ", -1).length.toLong)
    def capOf(n: Long) = caps.find(n <= _).getOrElse(8192L)
    val gBatches = (toks.length + 15) / 16
    val gPad = math.floor((1.0 - toks.sum.toDouble /
      (gBatches.toLong * 16 * toks.max).toDouble) * 1e6 + 0.5) / 1e6
    val expected = toks.groupBy(capOf).map { case (cap, ts) =>
      val batches = (ts.length + 15) / 16
      cap -> (ts.length.toLong, ts.sum, batches.toLong,
        math.floor((1.0 - ts.sum.toDouble /
          (batches.toLong * 16 * cap).toDouble) * 1e6 + 0.5) / 1e6)
    }
    assert(rows.map(_.getAs[Long]("cap")).toSet == expected.keySet)
    rows.foreach { r =>
      val (d, t, b, p) = expected(r.getAs[Long]("cap"))
      assert(r.getAs[Long]("n_docs") == d && r.getAs[Long]("n_tokens") == t &&
        r.getAs[Long]("n_batches") == b && r.getAs[Double]("pad_frac_r") == p,
        r.toString)
      assert(r.getAs[Double]("unbucketed_pad_frac_r") == gPad, r.toString)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == toks.length)
    // the report's reason to exist: token-weighted bucketed padding is
    // below the pad-everything-to-global-max baseline
    val totalPadded = rows.map(r =>
      r.getAs[Long]("n_batches") * 16 * r.getAs[Long]("cap")).sum
    val bucketedFrac = 1.0 - toks.sum.toDouble / totalPadded
    assert(bucketedFrac < gPad, s"bucketed $bucketedFrac vs global $gPad")
  }

  test("q128 epoch order: every epoch is a full permutation and epochs genuinely reshuffle") {
    val rows = Sampling.q128EpochOrder(spark, Sf, epochs = 3, numShards = 8).collect()
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.length == 3 * nDocs)
    // permutation per epoch: each doc exactly once
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1, 2))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length == nDocs, s"epoch $e")
      // contiguous positions within each shard
      rs.groupBy(_.getAs[Int]("shard")).foreach { case (sh, ss) =>
        assert(ss.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to ss.length),
          s"epoch $e shard $sh positions")
      }
    }
    // the reshuffle is real: the epoch-salted shard moves ~7/8 of docs,
    // and moved is null exactly on the first epoch
    rows.filter(_.getAs[Int]("epoch") == 0)
      .foreach(r => assert(r.isNullAt(r.fieldIndex("moved")), r.toString))
    val later = rows.filter(_.getAs[Int]("epoch") > 0)
    val movedFrac = later.count(r => !r.isNullAt(r.fieldIndex("moved")) &&
      r.getAs[Int]("moved") == 1).toDouble / later.length
    assert(movedFrac > 0.5, s"movedFrac $movedFrac")
  }

  test("q49 kept counts equal the per-row bucket decision") {
    val out = Sampling.q49SourceMixing(spark, Sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (rate, total, kept) =
        (r.getAs[Int]("rate_pct"), r.getAs[Long]("total_docs"),
          r.getAs[Long]("kept_docs"))
      assert(kept <= total)
      // full-rate sources keep everything; others keep a strict subset
      if (rate == 100) assert(kept == total, s"${r.getString(0)} dropped rows at 100%")
    }
  }

  test("q50 packing is gapless per shard and flags straddlers exactly") {
    val out = Sampling.q50PackSequences(spark, Sf, budget = 128)
    // recompute the running layout per (lang, shard) and check every doc
    val rows = out.orderBy("lang", "shard", "doc_id")
      .collect().groupBy(r => (r.getString(1), r.getInt(2)))
    rows.foreach { case (_, ds) =>
      var cursor = 0L
      ds.sortBy(_.getLong(0)).foreach { r =>
        val (n, pack, off, straddles) =
          (r.getAs[Long]("n_tok"), r.getAs[Long]("pack_id"),
            r.getAs[Long]("pack_offset"), r.getAs[Int]("straddles"))
        assert(pack == cursor / 128 && off == cursor % 128,
          s"doc ${r.getLong(0)}: expected offset $cursor")
        val expectStraddle = (cursor + n - 1) / 128 > cursor / 128
        assert((straddles == 1) == expectStraddle)
        cursor += n
      }
    }
  }

  test("q51 flags every benchmark doc fully and only overlapping docs") {
    val out = Curation.q51Decontaminate(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (isBench, grams, matched) =
        (r.getAs[Int]("is_benchmark"), r.getAs[Long]("n_grams"),
          r.getAs[Long]("n_matched"))
      assert(matched >= 1 && matched <= grams)
      // a benchmark doc matches itself on every gram
      if (isBench == 1) assert(matched == grams &&
        r.getAs[Double]("contamination") == 1.0)
    }
    // the benchmark slice itself must be present (self-contamination)
    assert(out.count(_.getAs[Int]("is_benchmark") == 1) >= 1)
  }

  test("q51 broadcasts the benchmark gram set") {
    val p = planString(Curation.q51Decontaminate(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), "benchmark join not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q99 bloom screen verifies back to exactly q51's answer") {
    // false negatives are impossible by construction, and the exact
    // verify join removes the false positives — so on q51's columns,
    // for docs with a real match, the two queries must agree VALUE for
    // VALUE, not just approximately
    val q51 = Curation.q51Decontaminate(spark, Sf)
      .select("doc_id", "is_benchmark", "n_grams", "n_matched", "contamination")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val q99 = Curation.q99BloomDecontaminate(spark, Sf).collect()
    assert(q99.nonEmpty)
    val withMatch = q99.filter(_.getAs[Long]("n_matched") > 0)
    assert(withMatch.map(_.getAs[Long]("doc_id")).toSet == q51.keySet,
      "verified-match doc set differs from q51's")
    withMatch.foreach { r =>
      val e = q51(r.getAs[Long]("doc_id"))
      Seq("is_benchmark", "n_grams", "n_matched", "contamination").foreach { c =>
        assert(r.getAs[Any](c) == e.getAs[Any](c),
          s"doc ${r.getAs[Long]("doc_id")} col $c: ${r.getAs[Any](c)} vs ${e.getAs[Any](c)}")
      }
    }
    // screen accounting is internally consistent: hits cover matches,
    // false positives are the (non-negative) difference
    q99.foreach { r =>
      val (hits, matched, fp) = (r.getAs[Long]("n_screen_hits"),
        r.getAs[Long]("n_matched"), r.getAs[Long]("n_false_pos"))
      assert(hits >= matched && fp == hits - matched && hits >= 1)
    }
  }

  test("q99 with a smaller bloom admits more false positives, same verified answer") {
    // shrinking m raises the screen's false-positive rate but can never
    // change the verified result — the exact join removes whatever the
    // looser filter lets through
    def run(mBits: Int) = Curation.q99BloomDecontaminate(spark, Sf, "md5", mBits)
      .collect()
    val wide = run(20)
    val tight = run(8) // 256-bit filter over ~thousands of grams: FPR near 1
    def verified(rows: Array[org.apache.spark.sql.Row]) =
      rows.filter(_.getAs[Long]("n_matched") > 0)
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matched")).toMap
    assert(verified(wide) == verified(tight))
    val fp = (rows: Array[org.apache.spark.sql.Row]) =>
      rows.map(_.getAs[Long]("n_false_pos")).sum
    assert(fp(tight) > fp(wide),
      s"256-bit filter should leak more FPs (${fp(tight)} vs ${fp(wide)})")
    intercept[IllegalArgumentException] {
      Curation.q99BloomDecontaminate(spark, Sf, "md5", 25)
    }
  }

  test("q99 xxhash64 mode verifies to the same matched answer as md5 mode") {
    // the production digest changes the bloom's false-positive PATTERN
    // but never the verified result: screen hits may differ, matched
    // grams cannot
    def keyed(mode: String) =
      Curation.q99BloomDecontaminate(spark, Sf, mode).collect()
        .filter(_.getAs[Long]("n_matched") > 0)
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_grams"), r.getAs[Long]("n_matched"),
            r.getAs[Double]("contamination"))).toMap
    val md = keyed("md5")
    val xx = keyed("xxhash64")
    assert(md.nonEmpty && md == xx)
  }

  test("q99's verify join is not a broadcast of the benchmark side") {
    // the whole point at 100 TB: the benchmark gram set does NOT
    // broadcast — the bloom (one 16 K-entry map row) is the only
    // benchmark-derived broadcast; verification is a shuffled join on
    // the screened sliver
    val p = planString(Curation.q99BloomDecontaminate(spark, Sf))
    assert(p.contains("ShuffledHashJoin"), "verify join should be shuffle_hash")
    assert(!p.contains("CartesianProduct"))
  }

  test("q100 UniMax waterfall: caps respected, budget exhausted, one level") {
    val rows = Sampling.q100UnimaxMixture(spark, Sf).collect()
    val capped = rows.filter(_.getAs[Int]("is_capped") == 1)
    val uncapped = rows.filter(_.getAs[Int]("is_capped") == 0)
    // the pinned regime is MIXED — the waterfall has something to decide
    assert(capped.nonEmpty && uncapped.nonEmpty)
    // nobody exceeds their epoch cap; capped languages take exactly
    // their one full epoch
    rows.foreach { r =>
      assert(r.getAs[Double]("alloc_tokens") <=
        r.getAs[Long]("cap_tokens").toDouble + 1e-6)
    }
    capped.foreach { r =>
      assert(r.getAs[Double]("alloc_tokens") ==
        r.getAs[Long]("cap_tokens").toDouble)
      assert(r.getAs[Double]("epochs_used") == 1.0)
    }
    // every uncapped language sits at ONE common water level, and the
    // level clears every capped language's cap (otherwise that cap
    // would not have bound)
    val levels = uncapped.map(_.getAs[Double]("alloc_tokens")).distinct
    assert(levels.length == 1, s"uncapped levels differ: ${levels.toSeq}")
    assert(levels.head >= capped.map(_.getAs[Long]("cap_tokens")).max.toDouble)
    // the budget is exhausted exactly (4dp rounding aside) and the
    // published weights normalize
    val budget = rows.map(_.getAs[Long]("avail_tokens")).sum * 4 / 5
    assert(math.abs(rows.map(_.getAs[Double]("alloc_tokens")).sum - budget) < 0.01,
      s"allocations do not sum to the budget $budget")
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-3)
  }

  test("PII patterns detect and redact injected emails, phones, and ids") {
    val d = Seq(
      (1L, "contact me at alice.smith+work@example.co.uk for details"),
      (2L, "call 555-867-5309 or 555.123.4567 now"),
      (3L, "ssn-like 123456789 and card 4111111111111111 here"),
      (4L, "clean text with no identifiers at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    d.withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.q52PiiRedact(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1)
    assert(out(2L).getAs[Long]("n_phones") == 2)
    assert(out(3L).getAs[Long]("n_ids") == 2)
    assert(out(4L).getAs[Int]("is_clean") == 1)
    // redaction changes the hash iff something was found
    val cleanMd5 = spark.sql(
      "SELECT md5('clean text with no identifiers at all')").head().getString(0)
    assert(out(4L).getAs[String]("redacted_md5") == cleanMd5)
    assert(out(1L).getAs[String]("redacted_md5") !=
      spark.sql("SELECT md5(lower('contact me at alice.smith+work@example.co.uk for details'))")
        .head().getString(0))
  }

  test("q105 redacts Luhn-valid card runs and refuses Luhn-failing ones") {
    val d = Seq(
      (1L, "pay with 4111111111111111 today"), // classic Luhn-valid PAN
      (2L, "ref 1234567890123456 code"),       // 16 digits, fails mod-10
      (3L, "clean text with no numbers at all"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("luhn").toString
    d.withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.q105LuhnRedact(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def m(s: String) =
      spark.sql(s"SELECT md5('$s')").head().getString(0)
    // valid PAN: detected, verified, and byte-exactly replaced
    assert(out(1L).getAs[Long]("n_candidates") == 1)
    assert(out(1L).getAs[Int]("luhn_valid") == 1)
    assert(out(1L).getAs[String]("redacted_md5") == m("pay with [CARD] today"))
    // 16-digit run failing mod-10: candidate seen, NOT redacted — the
    // false-positive discipline the checksum exists for
    assert(out(2L).getAs[Long]("n_candidates") == 1)
    assert(out(2L).getAs[Int]("luhn_valid") == 0)
    assert(out(2L).getAs[String]("redacted_md5") == m("ref 1234567890123456 code"))
    // no candidates: untouched
    assert(out(3L).getAs[Long]("n_candidates") == 0)
    assert(out(3L).getAs[Int]("luhn_valid") == 0)
    assert(out(3L).getAs[String]("redacted_md5") ==
      m("clean text with no numbers at all"))
  }

  test("q106 per-suite contamination unions back to exactly q51's non-benchmark flags") {
    val bySuite = Curation.q106DecontamBySuite(spark, Sf).collect()
    assert(bySuite.length == 3, "three stand-in suites must always report")
    bySuite.foreach { r =>
      assert(r.getAs[Long]("n_suite_grams") > 0)
      assert(r.getAs[Long]("n_contaminated_docs") <= r.getAs[Long]("n_gram_hits"))
      val f = r.getAs[Double]("contaminated_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // the suites partition the benchmark slice, so q51's flagged
    // NON-benchmark count is exactly the union of the per-suite sets: a
    // doc may be counted by several suites (sum ≥ union) but no single
    // suite can flag a doc q51 didn't (max ≤ union)
    val union = Curation.q51Decontaminate(spark, Sf)
      .filter(col("is_benchmark") === 0).count()
    val perSuite = bySuite.map(_.getAs[Long]("n_contaminated_docs"))
    assert(perSuite.sum >= union, "per-suite counts cannot sum below the union")
    assert(perSuite.max <= union, "no suite can flag more docs than the union")
  }

  test("q89 DSIR weights rank the target-domain language above the rest") {
    // the whole point of the importance weight: documents from the
    // target distribution (lang = 'en') must score higher under the
    // target/source log-ratio than documents from other languages
    val w = Curation.q89DsirWeights(spark, Sf)
      .join(Tables.load(spark, Sf, "documents").select("doc_id", "lang"), "doc_id")
    val mean = w.groupBy(col("lang") === "en")
      .agg(avg("avg_log_ratio"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(mean(true) > mean(false),
      s"en mean ${mean(true)} must exceed non-en mean ${mean(false)}")
    assert(w.count() == Tables.load(spark, Sf, "documents").count(),
      "every document gets a weight")
    // selected ⇔ avg_log_ratio > 0, by definition
    assert(w.filter((col("avg_log_ratio") > 0) =!=
      (col("selected") === 1)).count() == 0)
  }

  test("q90 rule battery flags injected violations and passes clean text") {
    import spark.implicits._
    val injected = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs to the hills."),
      (2L, "lorem ipsum dolor sit amet and the rest of the filler text goes here."),
      (3L, "function() { return 42; } the code block of a scraped page and a test."),
      (4L, "12 34 56 78 90 11 22 33"),
      (5L, "short one")
    ).toDF("doc_id", "text")
    val out = Curation.c4Rules(injected).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("passed") == 1, "clean sentence must pass all rules")
    assert(out(2L).getAs[Int]("r_no_lorem") == 0)
    assert(out(3L).getAs[Int]("r_no_brace") == 0)
    assert(out(4L).getAs[Int]("r_alpha") == 0)
    assert(out(4L).getAs[Int]("r_stopwords") == 0)
    assert(out(5L).getAs[Int]("r_min_words") == 0)
    assert(out(5L).getAs[Int]("r_terminal_punct") == 0)
    // the failure count is exactly the number of zero flags
    out.values.foreach { r =>
      val flags = Seq("r_terminal_punct", "r_min_words", "r_no_lorem",
        "r_no_brace", "r_word_len", "r_alpha", "r_stopwords").map(r.getAs[Int])
      assert(r.getAs[Long]("n_failed") == flags.count(_ == 0))
      assert((r.getAs[Int]("passed") == 1) == flags.forall(_ == 1))
    }
  }

  test("q91 recall is a valid fraction and the exact side always finds the re-encoded twin") {
    val out = graft.operators.Ann.q91AnnRecall(spark, Sf).collect()
    assert(out.length == 5, "one row per probe query")
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 10)
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_found") <= 10)
    }
    // vec 0's 1.01-rescaled twin (vec 10000, cosine ≈ 1) is in the
    // corpus: the brute-force top-10 contains it by construction, and an
    // LSH index that misses an identical-direction vector would be
    // broken — its recall must be > 0
    val q0 = out.find(_.getAs[Long]("q_id") == 0L).get
    assert(q0.getAs[Long]("n_found") >= 1, "q0 must at least find its re-encoded twin")
  }

  test("q53 output is deduped, quality-floored, and train-only") {
    val out = Curation.q53CuratedCorpus(spark, Sf)
    val n = out.count()
    assert(n > 0)
    assert(out.filter(col("quality_score") < 0.5).count() == 0)
    // every kept doc is in the train bucket of the q47 split
    val splits = Sampling.q47SplitAssign(spark, Sf)
    val offTrain = out.join(splits.filter(col("split") =!= "train"), "doc_id")
    assert(offTrain.count() == 0, "curated corpus leaked non-train docs")
    // no two kept docs share normalized content
    val dups = Tables.load(spark, Sf, "documents")
      .join(out.select("doc_id"), "doc_id")
      .groupBy(md5(lower(trim(col("text"))))).count()
      .filter(col("count") > 1)
    assert(dups.count() == 0, "curated corpus kept duplicate content")
  }

  /** JVM-side mirror of [[Sampling.hex24]] for independent recomputation. */
  private def jvmHex24(salt: String, key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$salt:$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16)
  }

  test("q103 per-document draw equals an exact independent recomputation") {
    val epochCap = 2
    val out = Sampling.q103MixtureDraw(spark, Sf, epochCap).collect()
    // per-lang epochs from the shared waterfall
    val alloc = Sampling.unimaxAlloc(spark, Sf, epochCap)
      .select("lang", "avail_tokens", "alloc_tokens").collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("alloc_tokens") / r.getAs[Long]("avail_tokens"))).toMap
    assert(out.nonEmpty)
    var sawFull = false
    out.foreach { r =>
      val epochs = alloc(r.getAs[String]("lang"))
      val full = math.floor(epochs).toInt
      val thresh = math.floor((epochs - full) * 16777216.0).toLong
      val hv = jvmHex24("mmix", r.getAs[Long]("doc_id").toString)
      val kept = if (hv < thresh) 1 else 0
      assert(r.getAs[Int]("full_copies") == full, s"doc ${r.get(0)} full")
      assert(r.getAs[Int]("frac_kept") == kept, s"doc ${r.get(0)} frac")
      assert(r.getAs[Int]("n_copies") == full + kept, s"doc ${r.get(0)} copies")
      if (full >= 1) sawFull = true
    }
    // epochCap=2 on this corpus: no cap binds, the common water level
    // puts the lowest-supply languages above one epoch — the guaranteed
    // full-copy path must actually be exercised
    assert(sawFull, "no language drew a guaranteed full copy at epochCap=2")
  }

  test("q104 manifest: copies complete, shards bounded, positions contiguous") {
    val shards = 8
    val out = Sampling.q104TrainOrder(spark, Sf, numShards = shards).cache()
    val rows = out.collect()
    // every materialized copy appears exactly once
    val copies = Sampling.q103MixtureDraw(spark, Sf)
      .agg(sum(col("n_copies"))).head().getLong(0)
    assert(rows.length.toLong == copies, "manifest row count != drawn copies")
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("copy_idx")))
      .distinct.length == rows.length, "duplicate (doc, copy) in manifest")
    // shard bounds honor the non-default parameter
    assert(rows.forall { r =>
      val s = r.getAs[Int]("shard"); s >= 0 && s < shards
    })
    // positions are 1..n contiguous per shard
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (sh, g) =>
      val pos = g.map(_.getAs[Int]("pos")).sorted
      assert(pos.head == 1 && pos.last == pos.length,
        s"shard $sh positions not contiguous")
    }
    // deterministic: a second run produces the identical manifest
    val again = Sampling.q104TrainOrder(spark, Sf, numShards = shards)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    out.unpersist()
  }

  test("q114 temperature mixture: distributions normalize, boost is monotone in supply") {
    val rows = Sampling.q114TemperatureMixture(spark, Sf).collect()
    assert(rows.length >= 2, "needs at least two languages to compare")
    // each policy column is a distribution (sums to 1 within rounding slack)
    for (c <- Seq("p_prop", "p_temp", "p_unif")) {
      val s = rows.map(_.getAs[Double](c)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$c sums to $s")
    }
    // τ < 1 compresses toward uniform: the boost p_temp/p_prop is
    // strictly decreasing in avail_tokens (n^(τ-1) is decreasing), >1
    // for the smallest language and <1 for the largest
    val bySupply = rows.sortBy(_.getAs[Long]("avail_tokens"))
    val boosts = bySupply.map(_.getAs[Double]("boost"))
    assert(boosts.zip(boosts.tail).forall { case (a, b) => a > b },
      s"boost not strictly decreasing in supply: ${boosts.toSeq}")
    assert(boosts.head > 1.0 && boosts.last < 1.0, boosts.toSeq.toString)
    // p_temp sits strictly between proportional and uniform for the
    // extreme languages (the policy's defining property)
    val lo = bySupply.head; val hi = bySupply.last
    assert(lo.getAs[Double]("p_prop") < lo.getAs[Double]("p_temp") &&
      lo.getAs[Double]("p_temp") < lo.getAs[Double]("p_unif"), lo.toString)
    assert(hi.getAs[Double]("p_unif") < hi.getAs[Double]("p_temp") &&
      hi.getAs[Double]("p_temp") < hi.getAs[Double]("p_prop"), hi.toString)
  }

  test("q123 dedup-aware mixture: clean supply verified independently, budget exhausted") {
    import graft.operators.{Clusters, Dedup}
    val rows = Sampling.q123DedupAwareMixture(spark, Sf).collect()
    assert(rows.length >= 2)
    // the deduped supply equals an independent recomputation from the
    // q46 canonicals over the same injected-dup corpus
    val keepers = Clusters.q46DedupClusters(spark, Sf)
      .filter(col("is_canonical")).select("doc_id")
    val dedupSupply = Dedup.corpus(spark, Sf).join(keepers, "doc_id")
      .withColumn("n_tok", size(split(lower(trim(col("text"))), " ")).cast("long"))
      .groupBy("lang").agg(sum("n_tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("avail_dedup_tokens") == dedupSupply(r.getAs[String]("lang")), r.toString)
      assert(r.getAs[Long]("removed_tokens") >= 0, r.toString)
      assert(r.getAs[Long]("avail_raw_tokens") >
        r.getAs[Long]("avail_dedup_tokens"), // every lang has injected re-crawl copies
        r.toString)
    }
    // the water level exhausts the budget: weights form a distribution
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, wsum.toString)
  }

  test("q121 pack report: exact pack arithmetic per lane, totals complete") {
    val docs = graft.Tables.load(spark, Sf, "documents")
    val packed = Sampling.q50PackSequences(spark, Sf).collect()
    val rows = Sampling.q121PackReport(spark, Sf).collect()
    // lanes partition the corpus completely
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      val packs = r.getAs[Long]("n_packs")
      assert(packs == (total + 511) / 512, r.toString)
      assert(r.getAs[Long]("pad_tokens") == packs * 512 - total, r.toString)
      val fill = r.getAs[Double]("fill")
      assert(fill > 0.0 && fill <= 1.0, r.toString)
      assert(r.getAs[Long]("straddle_docs") <= r.getAs[Long]("n_docs"))
    }
    // one lane cross-checked against the q50 frame it aggregates
    val lane = rows.head
    val inLane = packed.filter(p => p.getAs[String]("lang") == lane.getAs[String]("lang") &&
      p.getAs[Int]("shard") == lane.getAs[Int]("shard"))
    assert(lane.getAs[Long]("n_docs") == inLane.length)
    assert(lane.getAs[Long]("total_tokens") == inLane.map(_.getAs[Long]("n_tok")).sum)
    assert(lane.getAs[Long]("straddle_docs") ==
      inLane.map(_.getAs[Int]("straddles").toLong).sum)
  }

  test("q116 spans merge overlapping windows and split at gaps, by construction") {
    import spark.implicits._
    // benchmark doc (id 0, 97 | 0): tokens b1..b20. Three train docs:
    //   id 1: exactly b1..b8            → 1 window, 1 span, 8/8 covered → remove
    //   id 2: b1..b12 + 8 unique        → 5 overlapping windows chain into
    //         ONE span of 12 over 20 tokens → 0.6 → remove
    //   id 3: b1..b8, 9 unique, b13..b20 → two windows separated by a gap
    //         → 2 spans, 16/25 covered → remove; and
    //   id 4: b1..b8 + 72 unique        → 8/80 = 0.1 → redact_spans
    val b = (1 to 20).map(i => s"b$i")
    val mk = (ts: Seq[String]) => ts.mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("q116").toString
    Seq(
      (0L, mk(b)),
      (1L, mk(b.take(8))),
      (2L, mk(b.take(12) ++ (1 to 8).map(i => s"u$i"))),
      (3L, mk(b.take(8) ++ (1 to 9).map(i => s"v$i") ++ b.slice(12, 20))),
      (4L, mk(b.take(8) ++ (1 to 72).map(i => s"w$i"))))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.q116ContaminationSpan(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matched_windows"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("covered_tokens"), r.getAs[String]("decision"))).toMap
    assert(out(1L) == ((1L, 1L, 8L, "remove")), out(1L).toString)
    assert(out(2L) == ((5L, 1L, 12L, "remove")), out(2L).toString)
    assert(out(3L) == ((2L, 2L, 16L, "remove")), out(3L).toString)
    assert(out(4L) == ((1L, 1L, 8L, "redact_spans")), out(4L).toString)
    // the benchmark doc itself matches everywhere: fully covered
    assert(out(0L)._3 == 20L && out(0L)._4 == "remove", out(0L).toString)

    // q117 acts on those decisions: removes empty, excisions are the
    // uncovered tokens in original order, byte-for-byte
    val ex = Curation.q117SpanExcise(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), r.getAs[Long]("kept_tokens"),
          r.getAs[String]("text_out"))).toMap
    // remove docs: nothing kept
    for (id <- Seq(0L, 1L, 2L, 3L)) {
      assert(ex(id)._1 == "remove" && ex(id)._2 == 0L && ex(id)._3 == "",
        s"$id: ${ex(id)}")
    }
    // doc 4: span [1,8] cut, the 72 unique tokens survive in order
    val want4 = (1 to 72).map(i => s"w$i").mkString(" ")
    assert(ex(4L) == (("redact_spans", 72L, want4)), ex(4L).toString)
    // excised text contains no benchmark token and kept + covered = total
    assert(!ex(4L)._3.contains("b"), ex(4L)._3.take(50))
  }
}
