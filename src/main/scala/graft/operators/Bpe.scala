package graft.operators

import graft.{Frames, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich, Haddow & Birch, ACL
  * 2016) — the iterative loop whose single counting step q102 exposes:
  * start from characters + a `</w>` terminal, repeatedly take the
  * highest-weight adjacent symbol pair and merge it everywhere, k
  * times; the ordered merge list IS the tokenizer.
  *
  * Scale design (why a trainer can run over a 100 TB corpus at all):
  * every round operates on the DISTINCT-WORD frame — (word, freq,
  * symbol array) — so per-word work is independent of how often the
  * word occurs; the corpus is read ONCE to build that table (the only
  * corpus-sized shuffle, q102's), and each merge round is one pass over
  * the word types: explode adjacent pairs weighted by freq,
  * partial-aggregated groupBy to pick the top pair (a ONE-ROW driver
  * pull per round — bounded state, the CC-loop convergence-check
  * discipline), then a row-local fold rewrites each symbol array. The
  * evolving word frame is eagerly localCheckpoint'd each round and the
  * superseded snapshot freed immediately ([[Frames.freePinned]] — the
  * O(1)-pinned loop contract ClustersSpec enforces for CC), which also
  * keeps the plan from accreting k nested fold expressions.
  *
  * Tie-break is (count DESC, left ASC, right ASC) — identical to
  * q102's published ranking, so `train(…, 1)` head equals q102 rank 1
  * by construction (spec-pinned).
  */
object Bpe {

  /** Greedy left-to-right application of one merge to a symbol array —
    * the standard BPE apply order (for "aaa" under merge (a,a):
    * [aa, a]). Row-local fold; no UDF.
    */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, typedLit(Array.empty[String]), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** (word, freq) types of a document corpus — q102's word table. */
  def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(trim(col("text"))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character-level start state: one symbol per char plus `</w>`. */
  private def initialSyms(words: DataFrame): DataFrame =
    words.withColumn("syms", concat(
      expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"),
      array(lit("</w>"))))

  /** Adjacent-pair weights of the CURRENT segmentation. */
  private def pairCounts(syms: DataFrame): DataFrame =
    syms.withColumn("i", explode(sequence(lit(1), size(col("syms")) - 1)))
      .select(element_at(col("syms"), col("i")).as("a"),
        element_at(col("syms"), col("i") + 1).as("b"), col("freq"))
      .groupBy("a", "b").agg(sum(col("freq")).as("cnt"))

  /** Learn `numMerges` merges over `docs`' text. Returns the ordered
    * merge list (shorter if the corpus runs out of pairs with weight ≥
    * `minCount`). `segment(words, merges)` replays the result.
    */
  def train(docs: DataFrame, numMerges: Int, minCount: Long = 2L): Seq[(String, String)] = {
    var syms = initialSyms(wordTable(docs)).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var exhausted = false
      while (merges.size < numMerges && !exhausted) {
        val top = pairCounts(syms)
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .collect() // one row — the round's decision, like CC's delta count
        top.headOption.filter(_.getAs[Long]("cnt") >= minCount) match {
          case Some(r) =>
            val (a, b) = (r.getAs[String]("a"), r.getAs[String]("b"))
            merges += ((a, b))
            val next = syms
              .withColumn("syms", applyMerge(col("syms"), a, b))
              .localCheckpoint(true)
            Frames.freePinned(syms) // superseded round — O(1) pinned state
            syms = next
          case None => exhausted = true
        }
      }
      merges.toSeq
    } finally Frames.freePinned(syms)
  }

  /** Segment a (word, …) frame with an ordered merge list: replays the
    * merges in training order over the char start state. Same
    * round-by-round shape as training (checkpoint + free per merge) so
    * a long merge list neither accretes plan depth nor pins O(k)
    * snapshots.
    */
  def segment(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var syms = initialSyms(words).localCheckpoint(true)
    for ((a, b) <- merges) {
      val next = syms.withColumn("syms", applyMerge(col("syms"), a, b))
        .localCheckpoint(true)
      Frames.freePinned(syms)
      syms = next
    }
    syms.withColumn("n_tokens", size(col("syms")))
  }

  /** CLI: `runMain graft.operators.Bpe <dataDir> <numMerges>` — prints
    * the learned merge list with per-merge weights.
    */
  def main(args: Array[String]): Unit = {
    val (dataDir, k) = (args(0), args(1).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val merges = train(Tables.load(spark, dataDir, "documents"), k)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      println(s"merge ${i + 1}: '$a' + '$b'")
    }
    spark.stop()
  }
}
