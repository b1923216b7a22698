package graft

import graft.sources.InsightStore

/** Round-trip contract of the insight-run store: save → list_runs →
  * load_latest / load_by_date, re-run overwrite semantics, and the
  * partition-pruning guarantee on point reads.
  */
class InsightStoreSpec extends SparkSpec {

  private def discoveries(rows: (String, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("metric_a", "metric_b", "rho")
  }

  test("save → listRuns → loadLatest round-trips, newest run wins") {
    val dir = java.nio.file.Files.createTempDirectory("insight-store").toString + "/runs"
    InsightStore.save(discoveries(("view", "purchase", 0.4)), "2026-03-09", dir)
    InsightStore.save(discoveries(("view", "purchase", 0.55),
      ("click", "purchase", -0.2)), "2026-03-16", dir)

    assert(InsightStore.listRuns(spark, dir) == Seq("2026-03-09", "2026-03-16"))

    val latest = InsightStore.loadLatest(spark, dir).get
    assert(latest.count() == 2)
    assert(latest.select("run_date").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("2026-03-16"))
    // the point read must touch ONLY the latest run's partition files
    assert(latest.inputFiles.nonEmpty &&
      latest.inputFiles.forall(_.contains("run_date=2026-03-16")),
      latest.inputFiles.mkString(";"))

    val old = InsightStore.loadByDate(spark, dir, "2026-03-09").get
    assert(old.count() == 1)
  }

  test("re-saving a run date replaces that run without touching history") {
    val dir = java.nio.file.Files.createTempDirectory("insight-store").toString + "/runs"
    InsightStore.save(discoveries(("view", "purchase", 0.4)), "2026-03-09", dir)
    InsightStore.save(discoveries(("view", "purchase", 0.41)), "2026-03-16", dir)
    // the re-run of 03-16 carries different content — it must replace,
    // not append, and must leave 03-09 intact
    InsightStore.save(discoveries(("view", "purchase", 0.9),
      ("view", "click", 0.1)), "2026-03-16", dir)

    assert(InsightStore.listRuns(spark, dir) == Seq("2026-03-09", "2026-03-16"))
    val latest = InsightStore.loadLatest(spark, dir).get
    assert(latest.count() == 2)
    assert(latest.filter(latest("rho") === 0.9).count() == 1)
    assert(InsightStore.loadByDate(spark, dir, "2026-03-09").get.count() == 1)
  }

  test("empty store and missing dates return None/empty, not errors") {
    val dir = java.nio.file.Files.createTempDirectory("insight-store").toString + "/none"
    assert(InsightStore.listRuns(spark, dir).isEmpty)
    assert(InsightStore.loadLatest(spark, dir).isEmpty)
    assert(InsightStore.loadByDate(spark, dir, "2026-01-01").isEmpty)
  }
}
