package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-vocabulary BPE rehearsal (VERDICT r10 #4): train THOUSANDS
  * of merges at a real batch width and publish rounds + wall — the
  * arithmetic the batched trainer exists for ([[operators.Bpe.train]]'s
  * k/m round contract), measured instead of asserted.
  *
  * The synthetic corpora cap the trainer at ~110 merges: every scale
  * point ([[ScaleUp]]'s replicas included) holds the same 31 WORD types
  * — the replicas permute word order, which mints n-gram types but no
  * new unigrams, and BPE's distinct-word frame exhausts its pair
  * vocabulary almost immediately. This rehearsal therefore MINTS a
  * vocabulary deterministically from the corpus itself: every word gets
  * a per-(word, doc-group) base-36 suffix (`energy-k3f9x`), multiplying
  * 31 types into tens of thousands of realistic-length words whose
  * suffix characters give the trainer a genuinely deep merge frontier.
  * The minted text exercises exactly what the rehearsal must price —
  * the distinct-word frame size, the per-round pair aggregation, the
  * ≤ 4m-row pulls, and the O(1)-pinned loop at hundreds of rounds —
  * while staying a pure deterministic derivation of the driver's data.
  *
  * Prints one JSON line: word types, merges requested/learned, rounds,
  * rounds the k/m arithmetic predicts, wall seconds, and the pinned-RDD
  * count after training (must be 0 — the loop frees every superseded
  * round).
  *
  * Usage: `runMain graft.BpeRehearsal <sfDir> [merges] [batchMerges]`
  */
object BpeRehearsal {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val merges = args.lift(1).map(_.toInt).getOrElse(4096)
    val m = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mint the vocabulary: word w in doc-group g → "w-<base36(h(w,g))>",
    // deterministic in (w, g) so re-runs train identical merge lists
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("g", pmod(col("doc_id"), lit(997)))
      .withColumn("text", expr(
        "array_join(transform(split(lower(trim(text)), ' '), " +
          "t -> concat(t, '-', conv(CAST(abs(xxhash64(t, g)) % 1679616 AS STRING), 10, 36))), ' ')"))
      .select("text")

    val types = operators.Bpe.wordTable(docs).count()
    val t0 = System.nanoTime()
    val (learned, rounds) =
      operators.Bpe.trainWithStats(docs, merges, batchMerges = m)
    val wall = (System.nanoTime() - t0) / 1e9
    // the O(1)-pinned contract at real m: nothing survives the loop
    val pinned = spark.sparkContext.getPersistentRDDs.size
    println(s"""{"sf":"$sfDir","word_types":$types,"requested":$merges,""" +
      s""""batch_m":$m,"learned":${learned.size},"rounds":$rounds,""" +
      s""""km_rounds_predicted":${math.ceil(merges.toDouble / m).toInt},""" +
      s""""wall_s":${f"$wall%.1f"},"pinned_rdds_after":$pinned}""")
    spark.stop()
  }
}
