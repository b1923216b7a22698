package graft

import graft.operators.SemanticViews
import org.apache.spark.sql.functions._

/** The semantic layer must be queryable by name through SQL — that is the
  * reference's user-facing contract (athena/views.sql bio_gold.*).
  */
class SemanticViewsSpec extends SparkSpec {

  test("registerAll exposes all 11 views and each returns rows via SQL") {
    val names = SemanticViews.registerAll(spark, Sf)
    assert(names.length == 11)
    names.foreach { v =>
      val n = spark.sql(s"SELECT * FROM $v").count()
      assert(n > 0, s"view $v returned no rows")
    }
  }

  test("energy states and risk labels take only their defined values") {
    SemanticViews.registerAll(spark, Sf)
    val states = spark.sql("SELECT DISTINCT energy_state FROM graft_energy_state")
      .collect().map(_.getString(0)).toSet
    assert(states.subsetOf(Set("peak", "charged", "steady", "strained", "depleted")))
    val risks = spark.sql("SELECT DISTINCT churn_risk FROM graft_churn_risk")
      .collect().map(_.getString(0)).toSet
    assert(risks.subsetOf(Set("high_risk", "moderate_risk", "low_risk")))
  }

  test("activity-mix shares sum to ~1 where events exist") {
    SemanticViews.registerAll(spark, Sf)
    val bad = spark.sql(
      """SELECT view_share + purchase_share + click_share + error_share AS s
        |FROM graft_activity_mix WHERE total_events > 0""".stripMargin)
      .filter(abs(col("s") - 1.0) > 0.001).count()
    assert(bad == 0)
  }

  test("dashboard rolling averages are windowed per user (no cross-user leak)") {
    SemanticViews.registerAll(spark, Sf)
    // a user's first day must have 7day avg == that day's own score
    val firstDays = spark.sql(
      """SELECT user_id, day, view_score, view_score_7day_avg,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |FROM graft_dashboard_30d""".stripMargin)
      .filter(col("rn") === 1 && col("view_score").isNotNull)
      .filter(abs(col("view_score_7day_avg") - col("view_score")) > 0.001)
    assert(firstDays.count() == 0)
  }
}
