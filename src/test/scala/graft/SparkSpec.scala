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
