package graft

import org.apache.spark.sql.functions._

/** End-to-end corpus-curation pipeline: stage monotonicity, partitioned
  * output layout, and rerun determinism.
  */
class CurateSpec extends SparkSpec {

  test("curate pipeline filters monotonically and writes pruned partitions") {
    val out = java.nio.file.Files.createTempDirectory("curate").toString
    val s = Curate.run(spark, Sf, out)
    assert(s.input >= s.afterQuality)
    assert(s.afterQuality >= s.afterDedup)
    assert(s.afterDedup >= s.afterDecontam)
    assert(s.packed == s.afterDecontam, "write must preserve surviving rows")
    assert(s.packed > 0, "curation removed everything")
    // partitioned layout: split=/lang= directories exist for train
    val dirs = new java.io.File(s"$out/corpus").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("split=train")), dirs.mkString(","))
    val langs = new java.io.File(s"$out/corpus/split=train").listFiles().map(_.getName)
    assert(langs.exists(_.startsWith("lang=")), langs.mkString(","))
    // a trainer's read is partition-pruned and fully typed
    val train = spark.read.parquet(s"$out/corpus")
      .filter(col("split") === "train" && col("lang") === "en")
    assert(train.count() > 0)
    assert(train.columns.contains("pack_id"))
    // contaminated docs are really gone: nothing overlaps the benchmark
    val contaminated = graft.operators.Curation.q51Decontaminate(spark, Sf)
      .select("doc_id")
    val all = spark.read.parquet(s"$out/corpus").select("doc_id")
    assert(all.join(contaminated, "doc_id").count() == 0)
    // the run documents its own dedup savings: one keeper per cluster
    val rep = spark.read.parquet(s"$out/dedup_report")
    val agg = rep.agg(sum("n_clusters"), sum("n_docs"), sum("n_redundant")).first()
    assert(agg.getLong(0) == s.afterDedup, "keepers = clusters")
    assert(agg.getLong(1) - agg.getLong(2) == s.afterDedup,
      "docs minus redundant = keepers")
  }

  test("curate rerun is deterministic") {
    val (a, b) = (java.nio.file.Files.createTempDirectory("ca").toString,
      java.nio.file.Files.createTempDirectory("cb").toString)
    val s1 = Curate.run(spark, Sf, a)
    val s2 = Curate.run(spark, Sf, b)
    assert(s1 == s2)
    val da = spark.read.parquet(s"$a/corpus")
    val db = spark.read.parquet(s"$b/corpus")
    assert(da.except(db).count() == 0 && db.except(da).count() == 0)
  }
}
