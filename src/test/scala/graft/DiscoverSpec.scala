package graft

import graft.sources.InsightStore
import java.nio.file.Files

class DiscoverSpec extends SparkSpec {

  test("first run counts everything as new; an identical rerun finds nothing new") {
    val store = Files.createTempDirectory("discover").toString
    val r1 = Discover.run(spark, Sf, store, "2024-02-01", minRho = 0.0)
    assert(r1.findings > 0)
    assert(r1.newFindings == r1.findings, "no prior run: every finding is new")
    assert(r1.priorRun.isEmpty)

    val r2 = Discover.run(spark, Sf, store, "2024-02-02", minRho = 0.0)
    assert(r2.priorRun.contains("2024-02-01"))
    assert(r2.newFindings == 0, "identical battery vs identical prior: nothing new")
    assert(InsightStore.listRuns(spark, store) == Seq("2024-02-01", "2024-02-02"))
  }

  test("a stricter prior makes the relaxed rerun surface the filtered-out findings as new") {
    val store = Files.createTempDirectory("discover").toString
    val strict = Discover.run(spark, Sf, store, "2024-02-01", minRho = 0.99)
    val relaxed = Discover.run(spark, Sf, store, "2024-02-02", minRho = 0.0)
    assert(relaxed.findings > strict.findings)
    assert(relaxed.newFindings == relaxed.findings - strict.findings,
      "every finding the strict run filtered out must register as new")
  }

  test("the persisted run is the finding table: queryable with the declared schema") {
    val store = Files.createTempDirectory("discover").toString
    Discover.run(spark, Sf, store, "2024-02-01", minRho = 0.0)
    val loaded = InsightStore.loadLatest(spark, store).get
    assert(loaded.columns.toSet == Set("kind", "finding_key", "rho", "n", "run_date"))
    assert(loaded.count() > 0)
    val kinds = loaded.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("lag_spearman", "pearson_panel")))
  }
}
