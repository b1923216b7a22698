package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs; sf0.001 is the correctness grain. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val Sf: String = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Drop managed tables AND their warehouse directories — the one
    * cleanup every standing-index spec needs (a dead run's directory
    * with no catalog entry fails the next overwrite; see
    * Ingest.clearStaleLocation). Hoisted in round 12: three specs had
    * grown hand-rolled copies of the same loop.
    */
  def dropWarehouseTables(names: String*): Unit = names.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // the production orphan-cleanup resolves the managed location via
    // the catalog's own rule — one path-resolution rule, not a
    // hand-glued test copy of it
    graft.sources.Ingest.clearStaleLocation(spark, t)
  }

  /** A standing index's CURRENT physical name (round 14: refreshes land
    * versioned generations behind an atomic pointer) — specs that read
    * an index's side tables directly resolve through this.
    */
  def phys(table: String): String =
    graft.operators.Ann.physicalOf(spark, table)

  /** Operators persist internal frames (banded signatures, posting
    * lists, daily grains) that only die with the session — the same
    * contract the harness mains honor by clearing caches between
    * queries. Dropping them per SUITE keeps one suite's caches from
    * accumulating across the whole run or polluting another suite's
    * plan-string assertions (ADVICE r6).
    */
  override protected def afterAll(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
