package graft

import graft.operators.{Bpe, CorpusOps}
import org.apache.spark.sql.functions._

/** The distributed BPE trainer against a naive in-memory reference:
  * same start state (chars + `</w>`), same greedy apply, same
  * (count DESC, left, right) tie-break — merge lists must match
  * exactly, round for round.
  */
class BpeSpec extends SparkSpec {

  private def applyGreedy(seg: List[String], a: String, b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    for (x <- seg) {
      if (buf.nonEmpty && buf.last == a && x == b) {
        buf.remove(buf.size - 1); buf += (a + b)
      } else buf += x
    }
    buf.toList
  }

  private def naiveBpe(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var segs: Seq[(List[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toList :+ "</w>") -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((seg, f) <- segs; p <- seg.sliding(2) if p.size == 2)
        counts(p.head -> p(1)) = counts.getOrElse(p.head -> p(1), 0L) + f
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((a, b))
          segs = segs.map { case (seg, f) => applyGreedy(seg, a, b) -> f }
        case _ => done = true
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

  test("the first trained merge is q102's rank-1 pair (shared tie-break) on real data") {
    val docs = Tables.load(spark, Sf, "documents")
    val first = Bpe.train(docs, numMerges = 1).head
    val top = CorpusOps.q102BpePairs(spark, Sf).filter(col("rank") === 1).collect().head
    assert(first ==
      (top.getAs[String]("sym_left"), top.getAs[String]("sym_right")),
      s"trainer round 1 $first vs q102 rank 1")
  }

  test("segment re-spells every word, shrinks as merges accrue, and the trainer leaves no pinned state") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val docs = Tables.load(spark, toyDir, "documents")
    val merges = Bpe.train(docs, numMerges = 6)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "train must free every checkpointed round (the CC-loop O(1)-pinned contract)")
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
}
