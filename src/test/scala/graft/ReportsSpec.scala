package graft

import graft.operators.Reports
import org.apache.spark.sql.functions._

class ReportsSpec extends SparkSpec {

  private lazy val out = Reports.q79WeeklyReport(spark, Sf).collect()

  test("q79 emits at most one weekly-report row per entity, anchored at the corpus max day") {
    val users = out.map(_.getAs[Long]("user_id"))
    assert(users.length == users.distinct.length && users.nonEmpty)
    val ends = out.map(_.getAs[String]("week_end")).toSet
    assert(ends.size == 1, "every row anchors to the same corpus max day")
    out.foreach { r =>
      val start = java.time.LocalDate.parse(r.getAs[String]("week_start"))
      val end = java.time.LocalDate.parse(r.getAs[String]("week_end"))
      assert(java.time.temporal.ChronoUnit.DAYS.between(start, end) == 6)
    }
  }

  test("q79 deltas equal this-week minus previous-week on every row") {
    out.foreach { r =>
      val (a, p) = (r.getAs[Double]("avg_readiness"), r.getAs[Double]("prev_avg_readiness"))
      val d = r.getAs[Double]("readiness_delta")
      if (r.get(r.fieldIndex("avg_readiness")) != null &&
          r.get(r.fieldIndex("prev_avg_readiness")) != null)
        assert(math.abs(d - (a - p)) < 0.11, s"delta $d vs $a - $p")
      else assert(r.get(r.fieldIndex("readiness_delta")) == null)
      assert(r.getAs[Long]("workout_days_delta") <= r.getAs[Long]("workout_days"))
    }
  }

  test("q79 trend classes replay the reference's banded thresholds") {
    out.foreach { r =>
      val v = r.get(r.fieldIndex("avg_readiness"))
      val want =
        if (v == null) ""
        else {
          val x = r.getAs[Double]("avg_readiness")
          if (x >= 82) "trend-up" else if (x <= 70) "trend-down" else "trend-stable"
        }
      assert(r.getAs[String]("readiness_trend") == want)
    }
  }

  test("q79 data-day counts are bounded by the 7-day windows") {
    out.foreach { r =>
      assert(r.getAs[Long]("data_days") >= 0 && r.getAs[Long]("data_days") <= 7)
      assert(r.getAs[Long]("prev_data_days") >= 0 && r.getAs[Long]("prev_data_days") <= 7)
      assert(r.getAs[Long]("workout_days") <= r.getAs[Long]("data_days"))
    }
  }

  test("q79 plan: one bounded groupBy over the rollup, 1-row anchor broadcast, no SortMergeJoin") {
    val plan = Reports.q79WeeklyReport(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
