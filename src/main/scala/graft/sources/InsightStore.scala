package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Insight-run persistence: save / load-latest / list-runs of discovery
  * results keyed by run date (reference: insights_engine/insights/
  * discovery_persistence.py:28-84 — one JSON blob per run date under an
  * S3 prefix, latest = lexicographic max of the listed date prefixes).
  *
  * Spark-native form: a `run_date=`-partitioned parquet table. save()
  * dynamically overwrites ONLY its own run's partition (a re-run of
  * today's discovery replaces today, never history — the put_object
  * overwrite semantics). listRuns() is a directory listing (one LIST
  * call on an object store, no data scan); loadByDate/loadLatest read
  * with a partition-pruning filter, so "give me the newest run" touches
  * exactly one partition's files no matter how many years of runs
  * accumulate. Unlike the reference's opaque JSON, the persisted runs
  * stay a queryable table — `spark.read.parquet(dir)` over all runs is
  * the insight-history timeline for free.
  */
object InsightStore {

  /** Persist one run's results under `run_date=<runDate>`. */
  def save(results: DataFrame, runDate: String, dir: String): Unit = {
    val s = results.sparkSession
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    results.withColumn("run_date", lit(runDate))
      .write.mode("overwrite").partitionBy("run_date").parquet(dir)
  }

  /** All persisted run dates, ascending — a file listing, no data scan
    * (the CommonPrefixes walk of the reference's list_runs).
    */
  def listRuns(s: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("run_date="))
      .map(_.stripPrefix("run_date="))
      .sorted
  }

  /** One run's results, or None if that run date was never saved. Reads
    * the run's partition DIRECTORY, not the whole table with a filter —
    * by construction only that run's files are opened (asserted by
    * InsightStoreSpec via inputFiles), and the store never pays a
    * full-table file listing however many runs accumulate.
    */
  def loadByDate(s: SparkSession, dir: String, runDate: String): Option[DataFrame] =
    if (!listRuns(s, dir).contains(runDate)) None
    else Some(
      s.read.parquet(s"$dir/run_date=$runDate")
        .withColumn("run_date", lit(runDate)))

  /** The most recent run's results — max run date, one partition read. */
  def loadLatest(s: SparkSession, dir: String): Option[DataFrame] =
    listRuns(s, dir).lastOption.flatMap(loadByDate(s, dir, _))
}
