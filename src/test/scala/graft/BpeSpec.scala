package graft

import graft.operators.{Bpe, CorpusOps}
import org.apache.spark.sql.functions._

/** The distributed BPE trainer against a naive in-memory reference:
  * same start state (chars + `</w>`), same greedy apply, same
  * (count DESC, left, right) tie-break — merge lists must match
  * exactly, round for round. The reference splits words by CODE POINT
  * and tie-breaks by UTF-8 byte order (ADVICE r9: Spark's substr is
  * code-point based and its string sort is binary UTF-8, so a UTF-16
  * code-unit reference with Java String ordering would make parity
  * hold only on BMP corpora — the claim is now general, and the
  * astral-plane test below exercises it).
  */
class BpeSpec extends SparkSpec {

  /** Unsigned UTF-8 byte order — what Spark's UTF8String comparison
    * (and so the trainer's orderBy tie-break) actually sorts by.
    */
  private val utf8Ord: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var r = 0
    while (r == 0 && i < a.length && i < b.length) {
      r = (a(i) & 0xFF) - (b(i) & 0xFF); i += 1
    }
    if (r != 0) r else a.length - b.length
  }

  private def codePointSyms(w: String): List[String] =
    w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))

  private def applyGreedy(seg: List[String], a: String, b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    for (x <- seg) {
      if (buf.nonEmpty && buf.last == a && x == b) {
        buf.remove(buf.size - 1); buf += (a + b)
      } else buf += x
    }
    buf.toList
  }

  private def rankedPairs(segs: Seq[(List[String], Long)]): Seq[((String, String), Long)] = {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    for ((seg, f) <- segs; p <- seg.sliding(2) if p.size == 2)
      counts(p.head -> p(1)) = counts.getOrElse(p.head -> p(1), 0L) + f
    counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }(
      Ordering.Tuple3(Ordering.Long, utf8Ord, utf8Ord))
  }

  private def naiveBpe(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var segs: Seq[(List[String], Long)] =
      words.toSeq.map { case (w, f) => (codePointSyms(w) :+ "</w>") -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < k && !done) {
      rankedPairs(segs).headOption match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((a, b))
          segs = segs.map { case (seg, f) => applyGreedy(seg, a, b) -> f }
        case _ => done = true
      }
    }
    out.toSeq
  }

  /** The BATCHED policy's reference (VERDICT r9 #5), sequential-apply
    * semantics: per round, rank once, accept the top-ranked
    * symbol-disjoint pairs (the trainer's own [[Bpe.disjointBatch]]
    * over the same ADAPTIVE-headroom candidate window — round 12's
    * starvation ratchet: a round accepting under half its want doubles
    * the next round's window, cap 32×, healthy rounds reset to 4×),
    * then apply the accepted pairs ONE AT A TIME in acceptance order —
    * the semantics the one-pass fold must be equivalent to.
    */
  private def naiveBpeBatched(words: Map[String, Long], k: Int,
                              m: Int): Seq[(String, String)] = {
    var segs: Seq[(List[String], Long)] =
      words.toSeq.map { case (w, f) => (codePointSyms(w) :+ "</w>") -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var headroom = 4
    while (out.size < k && !done) {
      val want = math.min(m, k - out.size)
      val ranked = rankedPairs(segs).filter(_._2 >= 2)
        .take(headroom * want).map(_._1)
      val round = Bpe.disjointBatch(ranked, want)
      if (round.isEmpty) done = true
      else {
        out ++= round
        for ((a, b) <- round)
          segs = segs.map { case (seg, f) => applyGreedy(seg, a, b) -> f }
        headroom =
          if (round.size < (want + 1) / 2) math.min(headroom * 2, 32) else 4
      }
    }
    out.toSeq
  }

  private lazy val toyDir: String = {
    import spark.implicits._
    // the Sennrich toy shape: a corpus whose word-frequency table is
    // exactly {low:5, lower:2, newest:6, widest:3}
    val dir = java.nio.file.Files.createTempDirectory("bpe-toy").toString
    val text = (List.fill(5)("low") ++ List.fill(2)("lower") ++
      List.fill(6)("newest") ++ List.fill(3)("widest")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("trained merges equal the naive reference, round for round, on the toy corpus") {
    val docs = Tables.load(spark, toyDir, "documents")
    val got = Bpe.train(docs, numMerges = 8)
    val want = naiveBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(got == want, s"distributed $got vs reference $want")
    assert(got.nonEmpty && got.size == 8)
  }

  test("batchMerges=1 reproduces strict sequential BPE exactly (the single-merge equivalence pin)") {
    val docs = Tables.load(spark, toyDir, "documents")
    val sequential = Bpe.train(docs, numMerges = 8)
    val batchedM1 = Bpe.train(docs, numMerges = 8, batchMerges = 1)
    assert(batchedM1 == sequential)
    assert(sequential == naiveBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8))
  }

  test("batched training equals the batched reference policy, round for round, on the toy corpus") {
    val docs = Tables.load(spark, toyDir, "documents")
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    for (m <- Seq(2, 3, 8)) {
      val got = Bpe.train(docs, numMerges = 8, batchMerges = m)
      val want = naiveBpeBatched(freqs, 8, m)
      assert(got == want, s"m=$m: distributed $got vs batched reference $want")
      assert(got.nonEmpty)
    }
    // and the batched list still spells a working tokenizer: segments
    // re-spell every word byte-for-byte (the fold-vs-sequential proof
    // applied end to end)
    val merges = Bpe.train(docs, numMerges = 8, batchMerges = 3)
    val seg = Bpe.segment(Bpe.wordTable(docs), merges)
      .withColumn("respelled", expr("replace(concat_ws('', syms), '</w>', '')"))
      .collect()
    seg.foreach { r =>
      assert(r.getAs[String]("respelled") == r.getAs[String]("word"))
      // batched segment must equal the one-at-a-time naive replay
      val naiveSeg = merges.foldLeft(codePointSyms(r.getAs[String]("word")) :+ "</w>") {
        case (s, (a, b)) => applyGreedy(s, a, b)
      }
      assert(r.getSeq[String](seg.head.fieldIndex("syms")).toList == naiveSeg,
        s"batched segment diverged from sequential replay on ${r.getAs[String]("word")}")
    }
  }

  test("parity holds beyond the BMP: astral-plane code points split and tie-break identically") {
    import spark.implicits._
    // U+1D54F (𝕏) is two UTF-16 code units; a code-unit splitter would
    // break it into two lone surrogates and parity would silently fail
    val dir = java.nio.file.Files.createTempDirectory("bpe-astral").toString
    val x = new String(Character.toChars(0x1D54F))
    val text = (List.fill(4)(s"a${x}b") ++ List.fill(3)(s"c$x") ++
      List.fill(2)(s"${x}${x}d")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = Tables.load(spark, dir, "documents")
    val freqs = Map(s"a${x}b" -> 4L, s"c$x" -> 3L, s"${x}${x}d" -> 2L)
    assert(Bpe.train(docs, numMerges = 4) == naiveBpe(freqs, 4))
    assert(Bpe.train(docs, numMerges = 4, batchMerges = 2) ==
      naiveBpeBatched(freqs, 4, 2))
  }

  test("the first trained merge is q102's rank-1 pair (shared tie-break) on real data") {
    val docs = Tables.load(spark, Sf, "documents")
    val first = Bpe.train(docs, numMerges = 1).head
    val top = CorpusOps.q102BpePairs(spark, Sf).filter(col("rank") === 1).collect().head
    assert(first ==
      (top.getAs[String]("sym_left"), top.getAs[String]("sym_right")),
      s"trainer round 1 $first vs q102 rank 1")
  }

  test("segment re-spells every word, shrinks as merges accrue, and the trainer leaves no pinned state") {
    // set difference, not a count compare: earlier tests' freed blocks
    // unpersist ASYNCHRONOUSLY, so a count can shrink mid-test — the
    // contract here is "train leaked nothing NEW" (the AdmitSpec leak
    // check's shape)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = Tables.load(spark, toyDir, "documents")
    val merges = Bpe.train(docs, numMerges = 6)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"train must free every checkpointed round (leaked: $leaked)")
    val words = Bpe.wordTable(docs)
    val seg = Bpe.segment(words, merges)
      .withColumn("respelled",
        expr("replace(concat_ws('', syms), '</w>', '')"))
      .collect()
    seg.foreach { r =>
      assert(r.getAs[String]("respelled") == r.getAs[String]("word"),
        "token concatenation must re-spell the word byte-for-byte")
      assert(r.getAs[Int]("n_tokens") <= r.getAs[String]("word").length + 1)
    }
    // 6 merges on this corpus collapse the most frequent word types into
    // few tokens — 'newest' (freq 6) must be under 4 tokens by now
    val newest = seg.find(_.getAs[String]("word") == "newest").get
    assert(newest.getAs[Int]("n_tokens") < 4, newest.toString)
  }

  test("the distributed merge fold equals the reference greedy apply on random arrays") {
    import spark.implicits._
    // a 3-letter alphabet makes overlapping runs (aaa, abab) common —
    // exactly the cases where a wrong fold diverges from left-to-right
    // greedy semantics
    val rng = new scala.util.Random(7)
    def sym(): String = ('a' + rng.nextInt(3)).toChar.toString
    val cases = (1 to 60).map { i =>
      (i.toLong, List.fill(2 + rng.nextInt(10))(sym()), sym(), sym())
    }
    val frames = cases.map { case (id, seg, a, b) =>
      val got = Seq((id, seg)).toDF("id", "syms")
        .select(Bpe.applyMerge(col("syms"), a, b).as("merged"))
        .collect().head.getSeq[String](0).toList
      (got, applyGreedy(seg, a, b), seg, a, b)
    }
    frames.foreach { case (got, want, seg, a, b) =>
      assert(got == want, s"fold $got vs greedy $want on $seg merge ($a,$b)")
    }
  }

  test("q129 fertility totals reconcile with the corpus and the merges genuinely compress") {
    import org.apache.spark.sql.functions._
    val rows = Bpe.q129TokenizerFertility(spark, Sf).collect()
    assert(rows.nonEmpty)
    // words/chars columns are plain corpus arithmetic — recompute them
    // independently of the tokenizer path
    val direct = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("lang").agg(count(lit(1)).as("words"),
        sum(length(col("word"))).as("chars"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert((r.getAs[Long]("words"), r.getAs[Long]("chars")) == direct(lang), lang)
      // init symbols = chars + one </w> per word; merges only shrink
      assert(r.getAs[Long]("init_syms") ==
        r.getAs[Long]("chars") + r.getAs[Long]("words"), lang)
      assert(r.getAs[Long]("bpe_tokens") <= r.getAs[Long]("init_syms") &&
        r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("words"), lang)
      assert(r.getAs[Double]("fertility_r") >= 1.0, lang)
    }
    // the round-1 batch is non-empty on this corpus, so SOME language
    // must actually have been compressed
    assert(rows.exists(r =>
      r.getAs[Long]("bpe_tokens") < r.getAs[Long]("init_syms")), "no compression")
  }

  test("q113 equals the trainer's own first batched round replayed through segment") {
    // q113 IS one train(batchMerges = 8) iteration surfaced as a query.
    // Its merges are the trainer's own firstBatch; replaying them
    // through segment — which re-groups the list through ITS OWN
    // batching logic before folding — must reproduce q113's tokens
    // column byte-for-byte on the freq floor. The batch must also be a
    // filtered prefix of q102's published ranking (shared tie-break).
    val docs = Tables.load(spark, Sf, "documents")
    val merges = Bpe.firstBatch(docs, 8)
    assert(merges.nonEmpty && merges.size <= 8, merges.toString)
    // every selected pair appears in q102's ranking order, and the
    // selection is symbol-disjoint (no shared lefts/rights/merged)
    val ranked = graft.operators.CorpusOps.q102BpePairs(spark, Sf, topK = 200)
      .collect().map(r => (r.getAs[String]("sym_left"), r.getAs[String]("sym_right"))).toSeq
    assert(merges.forall(ranked.contains), s"$merges not all in q102 ranking")
    val syms = merges.flatMap { case (a, b) => Seq(a, b, a + b) }
    assert(syms.distinct.size == syms.size, s"batch not symbol-disjoint: $merges")
    val viaSegment = Bpe.segment(Bpe.wordTable(docs), merges)
      .filter(col("freq") >= 5)
      .select(col("word"), concat_ws(" ", col("syms")).as("tokens"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val q113 = Bpe.q113BpeSegment(spark, Sf).collect()
    assert(q113.nonEmpty)
    q113.foreach { r =>
      val w = r.getAs[String]("word")
      assert(viaSegment(w) == r.getAs[String]("tokens"),
        s"$w: q113 '${r.getAs[String]("tokens")}' vs segment '${viaSegment(w)}'")
      assert(r.getAs[Int]("n_tokens") ==
        r.getAs[String]("tokens").split(" ").length)
    }
    assert(q113.length == viaSegment.size)
  }
}
