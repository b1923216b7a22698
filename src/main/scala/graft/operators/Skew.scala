package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-phase aggregation and salted broadcast
  * joins (SURVEY.md §4). AQE's skew-join split covers sort-merge joins at
  * runtime; these helpers cover the cases AQE does not — a groupBy whose
  * hot key overwhelms one reducer, and a broadcast join against a skewed
  * probe side needing finer tasks.
  *
  * Salting is deterministic here (hash of a row-unique column, not
  * rand()): retries and speculative tasks must agg the same row into the
  * same salt bucket or partial counts double.
  */
object Skew {

  /** Decomposable aggregate spec: (partial expression, final combiner). */
  case class SaltedAgg(partial: String => Column, combine: String => Column)

  val sumAgg: SaltedAgg = SaltedAgg(c => sum(col(c)), c => sum(col(c)))
  val countAgg: SaltedAgg = SaltedAgg(_ => count(lit(1)), c => sum(col(c)))
  val maxAgg: SaltedAgg = SaltedAgg(c => max(col(c)), c => max(col(c)))
  val minAgg: SaltedAgg = SaltedAgg(c => min(col(c)), c => min(col(c)))

  /** Two-phase salted groupBy: phase 1 aggregates on (key, salt) — a hot
    * key fans out over `numSalts` reducers — phase 2 combines the (at most
    * numSalts) partials per key. Output column names are the input value
    * column names.
    *
    * @param saltSource a row-unique (or near-unique) column to derive the
    *                   deterministic salt from
    * @param aggs       value column → decomposable aggregate
    */
  def saltedGroupBy(df: DataFrame, key: String, saltSource: String,
                    numSalts: Int, aggs: Map[String, SaltedAgg]): DataFrame = {
    require(numSalts > 0)
    val salted = df.withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(numSalts)))
    val phase1 = salted.groupBy(col(key), col("_salt"))
      .agg(aggs.head._2.partial(aggs.head._1).as(aggs.head._1),
        aggs.tail.map { case (c, a) => a.partial(c).as(c) }.toSeq: _*)
    phase1.groupBy(col(key))
      .agg(aggs.head._2.combine(aggs.head._1).as(aggs.head._1),
        aggs.tail.map { case (c, a) => a.combine(c).as(c) }.toSeq: _*)
  }

  /** Salted broadcast join for a skewed probe side: replicate each build
    * row `numSalts` times with an explicit salt, salt the probe rows
    * deterministically, and join on (key, salt) — one hot key's probe rows
    * spread over `numSalts` tasks instead of one. Build side must be
    * broadcast-sized × numSalts.
    */
  def saltedBroadcastJoin(probe: DataFrame, build: DataFrame, key: String,
                          saltSource: String, numSalts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(numSalts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    saltedProbe.join(broadcast(replicated), Seq(key, "_salt")).drop("_salt")
  }
}
