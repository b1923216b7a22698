package graft

import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** Value-level checks for the rows-only LSH paths: the deterministically
  * injected duplicates (doc_id/vec_id + 10000) must be recovered.
  */
class DedupAnnSpec extends SparkSpec {

  test("q20 exact dedup collapses each injected duplicate into its canonical") {
    val out = Dedup.q20DedupExact(spark, Sf)
    val nDupes = out.filter(col("n_copies") === 2).count()
    val nInjected = Dedup.corpus(spark, Sf).filter(col("doc_id") >= 10000).count()
    assert(nDupes == nInjected, s"expected $nInjected duplicate groups, got $nDupes")
  }

  test("q21 minhash-LSH recovers injected exact dupes with all bands shared") {
    val out = Dedup.q21DedupMinhash(spark, Sf)
      .filter(col("doc_b") === col("doc_a") + 10000)
    val full = out.filter(col("n_shared_bands") === 8).count()
    assert(full == out.count() && full > 0)
  }

  test("q22 simhash gives injected dupes hamming distance 0") {
    val out = Dedup.q22DedupSimhash(spark, Sf)
      .filter(col("doc_b") === col("doc_a") + 10000 && col("hamming") === 0)
    assert(out.count() > 0)
  }

  test("q23 jaccard verification scores injected dupes at 1.0") {
    val out = Dedup.q23NgramJaccard(spark, Sf)
      .filter(col("doc_b") === col("doc_a") + 10000)
    assert(out.count() > 0)
    assert(out.filter(col("jaccard") < 1.0).count() == 0)
  }

  test("q24 embedding near-dup finds every injected rescaled vector") {
    val out = Ann.q24DedupEmbedding(spark, Sf)
      .filter(col("vec_b") === col("vec_a") + 10000)
    val nInjected = Ann.embCorpus(spark, Sf).filter(col("vec_id") >= 10000).count()
    assert(out.count() == nInjected)
    assert(out.filter(col("cosine") < 0.9999).count() == 0, "rescale must not change direction")
  }

  test("q25 brute-force ANN returns a full descending top-10 per query") {
    val rows = Ann.q25AnnBruteforce(spark, Sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q: ${rs.length} neighbors")
      val cosines = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        s"query $q: cosines not descending")
    }
  }

  test("IVF ANN recalls every genuinely-near neighbor at rank 1") {
    val top1 = Ann.ivfTopK(spark, Sf).filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_id"), r.getAs[Double]("cosine"))).toMap
    val expected = top1.keySet.filter(q => q % 5 == 0 && q < 50)
    assert(expected.nonEmpty)
    expected.foreach { q =>
      val (n, cos) = top1(q)
      assert(n == q + 10000, s"query $q: IVF top-1 was $n, expected ${q + 10000}")
      assert(cos >= 0.99)
    }
  }

  test("q26 LSH ANN recalls every genuinely-near neighbor at rank 1") {
    // queries with an injected near-dup (vec_id % 5 == 0 → +10000 at
    // cosine ≈ 1) must surface it as their top hit — LSH's recall contract
    val top1 = Ann.q26AnnLsh(spark, Sf).filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_id"), r.getAs[Double]("cosine"))).toMap
    val expected = top1.keySet.filter(q => q % 5 == 0 && q < 50)
    assert(expected.nonEmpty)
    expected.foreach { q =>
      val (n, cos) = top1(q)
      assert(n == q + 10000, s"query $q: top-1 was $n, expected ${q + 10000}")
      assert(cos >= 0.99, s"query $q: cosine $cos")
    }
  }
}
