package graft

import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** The admission composition end-to-end: each cycle screens against the
  * standing state and GROWS it, so a later batch is screened against an
  * earlier batch's admissions — the property the index appends exist for.
  */
class AdmitSpec extends SparkSpec {

  test("admission screens each batch against a standing state the previous cycle grew") {
    import spark.implicits._
    val band = "admit_band_test"
    val sem = "admit_sem_test"
    for (t <- Seq(band, sem, s"${sem}_centroids", s"${sem}_members")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val d = Tables.load(spark, Sf, "documents").select("doc_id", "text")
    val e = Tables.load(spark, Sf, "embeddings")
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .select("vec_id", "emb", "label")
    Dedup.refreshIndex(d, band, numBuckets = 8)
    Ann.refreshSemanticIndex(e, sem, numBuckets = 8)
    val out = java.nio.file.Files.createTempDirectory("admit").toString

    val corpusDoc10 = d.filter(col("doc_id") === 10L)
      .select("text").as[String].collect().head
    val vec5 = e.filter(col("vec_id") === 5L)
      .select("emb").as[Seq[Double]].collect().head
    def novelVec(seed: Int): Seq[Double] =
      (0 until 64).map(j => math.sin(seed * 64.0 + j))
    val textA = "entirely fresh prose about quantum marble butterflies " +
      "gliding past copper lighthouses while seventeen astronomers argue"
    val textE = "another genuinely new passage concerning velvet glaciers " +
      "and the arithmetic of forgotten tram schedules at midnight"

    // batch 1: a copy of corpus doc 10 (surface reject), doc A (novel
    // text + novel vector: admit), doc B (novel text but a re-encode of
    // corpus vector 5: semantic reject)
    val b1 = Seq(
      (600001L, corpusDoc10),
      (600002L, textA),
      (600003L, "plainly unseen sentences describing cardboard comets and " +
        "the bureaucracy of lighthouse keepers during a quiet eclipse"))
      .toDF("doc_id", "text")
    val b1v = Seq(
      (600002L, novelVec(901)),
      (600003L, vec5.map(_ * 0.99))).toDF("vec_id", "emb")
    val r1 = Admit.admitBatch(spark, b1, band, out, 1L, Some(b1v), Some(sem))
    assert(r1 == Admit.Report(1L, 3, 1, 1, 1), r1.toString)

    // batch 2: a copy of doc A (caught ONLY because cycle 1 appended its
    // bands), a re-encode of doc A's vector under new text (caught ONLY
    // because cycle 1 appended its cell/bands), and doc E (admit)
    val b2 = Seq(
      (700001L, textA),
      (700002L, "wholly different surface form reciting dune-colored " +
        "mathematics to an audience of patient carpenter bees today"),
      (700003L, textE)).toDF("doc_id", "text")
    val b2v = Seq(
      (700002L, novelVec(901).map(_ * 0.99)),
      (700003L, novelVec(902))).toDF("vec_id", "emb")
    val r2 = Admit.admitBatch(spark, b2, band, out, 2L, Some(b2v), Some(sem))
    assert(r2 == Admit.Report(2L, 3, 1, 1, 1), r2.toString)

    // the landing holds exactly the admitted docs, partitioned per batch
    val landed = spark.read.parquet(out)
      .select("batch_id", "doc_id").as[(Int, Long)].collect().toSet
    assert(landed == Set((1, 600002L), (2, 700003L)), landed.toString)
  }
}
