package graft

import graft.operators.{SemanticViews, TrainingLoad, Windows}
import graft.sources.Ingest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end medallion run — the reference's daily batch
  * (bronze normalize → gold_daily_rollup → semantic views → analytics
  * outputs) as one orchestrated entry point over a data directory.
  * (reference: glue/dbt_gold_refresh.py orchestration +
  * oura_normalizer.py:295 partitioned gold writes.)
  *
  * Layout written under `outDir`:
  *   gold_daily_rollup/year=YYYY/month=M/ — partitioned gold table
  *   training_load/                        — exact EMA CTL/ATL/TSB
  * and the 8 semantic views registered on the session for SQL access.
  */
object Pipeline {

  case class Summary(rollupRows: Long, trainingLoadRows: Long, views: Seq[String])

  def run(spark: SparkSession, dataDir: String, outDir: String): Summary = {
    // gold rollup: fused single-scan plan, partitioned for pruned reads.
    // The unsorted core — a global sort before a partitioned write only
    // reshuffles what partitionBy is about to split anyway
    val rollup = Windows.dailyRollup(spark, dataDir)
    rollup.write.mode("overwrite")
      .partitionBy("year", "month")
      .parquet(s"$outDir/gold_daily_rollup")

    // analytics: exact training-load EMA
    val tl = TrainingLoad.asDf(spark, dataDir)
    tl.write.mode("overwrite").parquet(s"$outDir/training_load")

    // semantic layer for ad-hoc SQL — over the materialized gold table,
    // so view queries read pruned parquet instead of re-running the rollup
    val gold = spark.read.parquet(s"$outDir/gold_daily_rollup")
    val views = SemanticViews.registerOver(gold)

    Summary(
      rollupRows = gold.count(),
      trainingLoadRows = spark.read.parquet(s"$outDir/training_load").count(),
      views = views)
  }

  /** CLI: `runMain graft.Pipeline <dataDir> <outDir>` */
  def main(args: Array[String]): Unit = {
    val Array(dataDir, outDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = run(spark, dataDir, outDir)
    println(s"pipeline: rollup=${s.rollupRows} rows, training_load=${s.trainingLoadRows} rows, " +
      s"views=${s.views.mkString(",")}")
    spark.stop()
  }
}
