package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("end-to-end pipeline writes partitioned gold + analytics and registers views") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val s = Pipeline.run(spark, Sf, out)
    assert(s.rollupRows > 0 && s.trainingLoadRows > 0 && s.views.length == 10)

    // partition layout exists and predicates prune to partition filters
    val gold = spark.read.parquet(s"$out/gold_daily_rollup")
    val pruned = gold.filter(col("year") === 2024 && col("month") === 1)
    val plan = planString(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(year"), plan.take(400))
    assert(pruned.count() > 0)

    // the semantic layer answers SQL over the same session
    assert(spark.sql("SELECT COUNT(*) FROM graft_energy_state").first().getLong(0) > 0)
  }
}
