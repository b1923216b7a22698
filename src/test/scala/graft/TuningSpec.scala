package graft

import org.apache.spark.sql.functions._

/** The sf3 shuffle-width rule as code (PLANS.md round-9 rehearsal):
  * partitions ∝ corpus bytes for the posting-list shuffle family, with
  * the per-core session default as the floor.
  */
class TuningSpec extends SparkSpec {

  test("inputBytes reads real table footprints and grows with scale") {
    val tiny = Tuning.inputBytes(spark, "/root/testdata/sf0.001", Seq("documents"))
    val big = Tuning.inputBytes(spark, "/root/testdata/sf0.1", Seq("documents"))
    assert(tiny > 0)
    assert(big > 4 * tiny, s"sf0.1 ($big B) should dwarf sf0.001 ($tiny B)")
    // a missing table contributes 0, not an exception — pipelines may
    // run against dirs that carry only the tables they use
    val withMissing = Tuning.inputBytes(spark, "/root/testdata/sf0.001",
      Seq("documents", "no_such_table"))
    assert(withMissing == tiny)
  }

  test("scaledShufflePartitions floors at core count and scales linearly") {
    val floor = spark.sparkContext.defaultParallelism
    // below the boundary the rule changes nothing: tiny input → the
    // pre-rule per-core width
    assert(Tuning.scaledShufflePartitions(spark, 1024) == floor)
    // the sf3 calibration point: ~17 MB of documents parquet needed
    // ≥96 partitions (32 went spill-bimodal); the constants must
    // reproduce that requirement
    val sf3Bytes = 17L * 1024 * 1024
    val atSf3 = Tuning.scaledShufflePartitions(spark, sf3Bytes)
    assert(atSf3 >= 96, s"sf3-sized input sized to $atSf3 partitions, measured need was 96")
    // linear in bytes above the floor (the rule, not a step function)
    val doubled = Tuning.scaledShufflePartitions(spark, 2 * sf3Bytes)
    assert(math.abs(doubled - 2 * atSf3) <= 2,
      s"2x bytes gave $doubled vs 2x$atSf3 partitions")
  }

  test("shufflePartitionsFor on the test grain is the per-core floor") {
    assert(Tuning.shufflePartitionsFor(spark, Sf) ==
      spark.sparkContext.defaultParallelism)
  }

  test("spreadSmall engages below the floor, no-ops above, and never changes rows") {
    val docs = Tables.load(spark, Sf, "documents")
    // under the floor: the plan gains exactly one round-robin exchange
    val spread = Tuning.spreadSmall(docs)
    val p = spread.queryExecution.executedPlan.toString()
    assert(p.contains("roundrobin") || p.contains("RoundRobin"),
      s"tiny input must spread: ${p.take(300)}")
    assert(spread.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // above the floor (forced with floorBytes = 0): plan unchanged —
    // the scale no-op the rule promises
    val noop = Tuning.spreadSmall(docs, floorBytes = 0L)
    assert(noop.queryExecution.executedPlan.toString() ==
      docs.queryExecution.executedPlan.toString(),
      "above the floor the frame must pass through untouched")
    // values: same multiset of rows either way
    assert(spread.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("withShuffleWidth applies the width to shuffles and restores the conf") {
    val key = "spark.sql.shuffle.partitions"
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    val prevCoalesce = spark.conf.get(coalesceKey)
    // disable AQE's post-shuffle coalesce for the physical assertion —
    // in production it only ever trims the width downward, which is the
    // documented safe direction
    spark.conf.set(coalesceKey, "false")
    try {
      val width = 7
      val parts = Tuning.withShuffleWidth(spark, width) {
        assert(spark.conf.get(key) == width.toString)
        Tables.load(spark, Sf, "documents")
          .groupBy("lang").agg(count(lit(1)))
          .rdd.getNumPartitions
      }
      assert(parts == width, s"shuffle ran at $parts partitions, not $width")
      assert(spark.conf.get(key) == prev, "conf not restored")
      // restoration survives a failing body
      intercept[RuntimeException] {
        Tuning.withShuffleWidth(spark, 13) { throw new RuntimeException("boom") }
      }
      assert(spark.conf.get(key) == prev, "conf not restored after failure")
    } finally spark.conf.set(coalesceKey, prevCoalesce)
  }
}
