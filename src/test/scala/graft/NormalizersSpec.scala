package graft

import graft.sources.Normalizers
import org.apache.spark.sql.functions._

class NormalizersSpec extends SparkSpec {

  import spark.implicits._

  test("snakeCaseColumns normalizes the reference's header shapes") {
    val df = Seq((1, 2, 3, 4)).toDF("Saturated Fat", "Live/On-Demand", "Avg. Speed (mph)", "ok_name")
    val got = Normalizers.snakeCaseColumns(df).columns.toSeq
    assert(got == Seq("saturated_fat", "live_on-demand", "avg_speed_mph", "ok_name"))
  }

  test("snakeCaseColumns fails fast when two raw headers collide post-normalization") {
    val df = Seq((1, 2)).toDF("Total Time", "total.time")
    val e = intercept[IllegalArgumentException](Normalizers.snakeCaseColumns(df))
    assert(e.getMessage.contains("Total Time") && e.getMessage.contains("total.time"),
      e.getMessage)
  }

  test("snakeCaseColumnsDedup suffixes collisions instead of failing, values intact") {
    val df = Seq((1, 2, 3)).toDF("Total Time", "total.time", "other")
    val out = Normalizers.snakeCaseColumnsDedup(df)
    assert(out.columns.toSeq == Seq("total_time", "total_time_2", "other"))
    val r = out.head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 2 && r.getInt(2) == 3,
      "positional values must follow their renamed headers")
  }

  test("parseWorkoutTimestamp splits offset and zone-name suffixes, with and without seconds") {
    val df = Seq(
      ("2026-02-21 07:25 (-05)"),
      ("2026-02-21 07:25:30 (EST)"),
      ("2026-02-21")).toDF("raw")
    val out = Normalizers.parseWorkoutTimestamp(df, "raw")
      .select("workout_date", "workout_time", "workout_ts_utc").collect()
    assert(out(0).toSeq == Seq("2026-02-21", "07:25", "2026-02-21 07:25"))
    assert(out(1).toSeq == Seq("2026-02-21", "07:25:30", "2026-02-21 07:25:30"))
    assert(out(2).toSeq == Seq("2026-02-21", "", "2026-02-21"))
  }

  test("categorizeWorkout maps known disciplines case-insensitively and defaults to other") {
    val df = Seq("Cycling", "STRENGTH", "yoga").toDF("discipline")
    val out = Normalizers.categorizeWorkout(df, "discipline",
      Map("cycling" -> "cardio_high", "strength" -> "strength_training"))
      .select("workout_category").as[String].collect().toSeq
    assert(out == Seq("cardio_high", "strength_training", "other"))
  }

  test("outputPerMinute and hrZones replay the reference's guards and bands") {
    val df = Seq(
      (300.0, Some(30), Some(115.0)),
      (100.0, Some(0), Some(125.0)),   // zero minutes -> null opm
      (100.0, None, Some(145.0)),      // null minutes -> null opm
      (100.0, Some(10), Some(165.0)),
      (100.0, Some(10), Some(185.0)),
      (100.0, Some(10), None)          // null HR -> null zone
    ).toDF("total_output", "length_minutes", "avg_heartrate")
    val out = Normalizers.hrZones(
      Normalizers.outputPerMinute(df, "total_output", "length_minutes"), "avg_heartrate")
      .select("output_per_minute", "hr_zone").collect()
    assert(out(0).getAs[Double]("output_per_minute") == 10.0 && out(0).getAs[Int]("hr_zone") == 1)
    assert(out(1).isNullAt(0) && out(1).getAs[Int]("hr_zone") == 2)
    assert(out(2).isNullAt(0) && out(2).getAs[Int]("hr_zone") == 3)
    assert(out(3).getAs[Double]("output_per_minute") == 10.0 && out(3).getAs[Int]("hr_zone") == 4)
    assert(out(4).getAs[Int]("hr_zone") == 5)
    assert(out(5).isNullAt(1))
  }

  test("excludeSource drops the other normalizer's rows case-insensitively") {
    val df = Seq("Peloton App", "Apple Watch", "PELOTON-bike").toDF("source_app")
    val out = Normalizers.excludeSource(df, "source_app", "peloton")
      .as[String].collect().toSeq
    assert(out == Seq("Apple Watch"))
  }

  test("mealToDaily collapses duplicate exports, sums the day, and derives macro shares") {
    val meals = Seq(
      ("2024-01-01", "breakfast", 400.0, 30.0, 40.0, 10.0),
      ("2024-01-01", "breakfast", 400.0, 30.0, 40.0, 10.0), // duplicate export row
      ("2024-01-01", "dinner", 600.0, 50.0, 60.0, 20.0),
      ("2024-01-02", "lunch", 500.0, 25.0, 50.0, 15.0)
    ).toDF("date", "meal", "calories", "protein_g", "carbohydrates_g", "fat_g")
    val out = Normalizers.mealToDaily(meals,
        Seq("calories", "protein_g", "carbohydrates_g", "fat_g"))
      .orderBy("date").collect()
    val d1 = out(0)
    assert(d1.getAs[Double]("calories") == 1000.0)
    assert(d1.getAs[Long]("meal_count") == 2)
    assert(d1.getAs[String]("meals_logged") == "breakfast,dinner")
    // 80 g protein * 4 / 1000 cal = 32.0%
    assert(d1.getAs[Double]("protein_pct") == 32.0)
    assert(d1.getAs[Double]("carb_pct") == 40.0)
    assert(d1.getAs[Double]("fat_pct") == 27.0)
    val d2 = out(1)
    assert(d2.getAs[Double]("calories") == 500.0 && d2.getAs[Long]("meal_count") == 1)
  }

  test("bodyDaily forward-fills sporadic body-composition measurements") {
    val df = Seq(
      ("2024-01-01", Some(180.0), Some(22.0)),
      ("2024-01-02", Some(179.5), None),
      ("2024-01-03", None, None)
    ).toDF("date", "weight_lbs", "body_fat_pct")
    val out = Normalizers.bodyDaily(df, Seq("weight_lbs", "body_fat_pct"))
      .orderBy("date").collect()
    assert(out(1).getAs[Double]("weight_lbs") == 179.5)
    assert(out(1).getAs[Double]("body_fat_pct") == 22.0)
    assert(out(2).getAs[Double]("weight_lbs") == 179.5)
  }

  test("q80 is a single-scan projection: no exchange besides the harness sort") {
    val plan = Normalizers.q80WorkoutNormalize(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), "q80 must not aggregate")
    assert(!plan.contains("Join"), "q80 must not join")
  }
}
