package graft

import graft.operators.TrainingLoad
import org.apache.spark.sql.functions._

class TrainingLoadSpec extends SparkSpec {

  test("emaFold matches the adjust=False recurrence") {
    val xs = Seq(10.0, 20.0, 30.0)
    val alpha = 2.0 / (7 + 1)
    val expected = Seq(
      10.0,
      alpha * 20.0 + (1 - alpha) * 10.0,
      alpha * 30.0 + (1 - alpha) * (alpha * 20.0 + (1 - alpha) * 10.0))
    assert(TrainingLoad.emaFold(xs, 7) == expected)
    assert(TrainingLoad.emaFold(Seq.empty, 7).isEmpty)
  }

  test("classifyForm thresholds") {
    assert(TrainingLoad.classifyForm(20.0) == "fresh")
    assert(TrainingLoad.classifyForm(15.0) == "neutral")
    assert(TrainingLoad.classifyForm(0.0) == "neutral")
    assert(TrainingLoad.classifyForm(-0.1) == "building")
    assert(TrainingLoad.classifyForm(-15.0) == "building")
    assert(TrainingLoad.classifyForm(-15.1) == "fatigued")
  }

  test("distributed EMA equals a local fold per user") {
    val out = TrainingLoad.asDf(spark, Sf)
    assert(out.count() > 0)
    // pick the busiest user and replay the fold locally
    val uid = out.groupBy("user_id").count().orderBy(desc("count"), asc("user_id"))
      .first().getLong(0)
    val series = out.filter(col("user_id") === uid).orderBy("day").collect()
    val loads = series.map(_.getAs[Double]("daily_load")).toSeq
    val ctl = TrainingLoad.emaFold(loads, TrainingLoad.CtlSpan)
    val atl = TrainingLoad.emaFold(loads, TrainingLoad.AtlSpan)
    series.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("ctl") == math.floor(ctl(i) * 1e4 + 0.5) / 1e4)
      assert(r.getAs[Double]("atl") == math.floor(atl(i) * 1e4 + 0.5) / 1e4)
      assert(r.getAs[String]("form") == TrainingLoad.classifyForm(ctl(i) - atl(i)))
    }
  }
}
