package graft

import graft.operators.{Alerts, Briefing}
import graft.sources.{HealthKitXml, Ingest, InsightStore}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end daily-ingestion chain — the health-side analog of
  * CurateSpec's corpus pipeline, mirroring the reference's orchestrated
  * flow (reference: lambda/pipeline_orchestrator/handler.py — HealthKit
  * normalizer → silver/gold refresh → morning briefing;
  * insights_engine/insights/discovery_persistence.py — persist the run):
  * XML export → partitioned bronze parquet → gold rollup → alert rules +
  * briefing → insight-run store round-trip. Each arrow is the engine
  * operator the infra step wraps; the chain proves they compose.
  */
class DailyFlowSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("XML export → partitioned bronze → pruned read-back") {
    val xmlDir = tmp("graft_flow_xml")
    val xml =
      """<HealthData>
        | <Record type="HKQuantityTypeIdentifierRestingHeartRate" unit="count/min" startDate="2026-01-05 07:00:00 -0500" endDate="2026-01-05 07:00:00 -0500" value="52"/>
        | <Record type="HKQuantityTypeIdentifierRestingHeartRate" unit="count/min" startDate="2026-02-06 07:00:00 -0500" endDate="2026-02-06 07:00:00 -0500" value="55"/>
        |</HealthData>""".stripMargin
    Files.write(java.nio.file.Paths.get(xmlDir, "export.xml"), xml.getBytes)

    val vitals = HealthKitXml.dailyVitals(
      HealthKitXml.readRecords(spark, s"$xmlDir/export.xml"))
    val bronze = tmp("graft_flow_bronze")
    Ingest.writePartitioned(vitals, "date", bronze)

    // the bronze layout must prune: a one-month read opens only that
    // month's partition files
    val feb = spark.read.parquet(bronze).filter(col("year") === 2026 && col("month") === 2)
    assert(feb.count() == 1)
    // inputFiles reports the base relation pre-pruning; the pruning
    // contract lives in the scan's PartitionFilters
    val plan = planString(feb)
    assert(plan.contains("PartitionFilters") && plan.contains("(month"),
      "month filter must reach the scan as a partition filter: " + plan.take(400))
  }

  test("gold rollup → alerts + briefing → insight store round-trip") {
    // gold refresh over the synthetic fact table (the dbt step)
    val alerts = Alerts.q71AlertRules(spark, Sf)
    val briefing = Briefing.q75MorningBriefing(spark, Sf)
    assert(briefing.count() > 0)

    // the briefing run persists like a discovery run: keyed by run date,
    // re-saving the same date replaces it, latest wins
    val store = tmp("graft_flow_store")
    InsightStore.save(briefing.limit(50), "2026-01-05", store)
    InsightStore.save(alerts.limit(50), "2026-01-06", store)
    assert(InsightStore.listRuns(spark, store) == Seq("2026-01-05", "2026-01-06"))

    val latest = InsightStore.loadLatest(spark, store).get
    assert(latest.columns.contains("condition"), "latest run must be the alerts save")
    assert(latest.count() == math.min(50, alerts.count()))
  }
}
