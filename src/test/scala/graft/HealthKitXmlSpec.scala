package graft

import graft.sources.HealthKitXml

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

class HealthKitXmlSpec extends SparkSpec {

  private def writeExport(): Path = {
    val dir = Files.createTempDirectory("graft_hk")
    dir.toFile.deleteOnExit()
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<HealthData locale="en_US">
        | <Record type="HKQuantityTypeIdentifierRestingHeartRate" sourceName="Watch" unit="count/min" startDate="2026-01-05 07:00:00 -0500" endDate="2026-01-05 07:00:00 -0500" value="52"/>
        | <Record type="HKQuantityTypeIdentifierRestingHeartRate" sourceName="Watch" unit="count/min" startDate="2026-01-05 21:00:00 -0500" endDate="2026-01-05 21:00:00 -0500" value="48"/>
        | <Record type="HKQuantityTypeIdentifierOxygenSaturation" sourceName="Watch" unit="%" startDate="2026-01-05 08:00:00 -0500" endDate="2026-01-05 08:00:00 -0500" value="0.97"/>
        | <Record type="HKQuantityTypeIdentifierOxygenSaturation" sourceName="Watch" unit="%" startDate="2026-01-05 20:00:00 -0500" endDate="2026-01-05 20:00:00 -0500" value="0.99"/>
        | <Record type="HKQuantityTypeIdentifierBodyMass" sourceName="Scale" unit="kg" startDate="2026-01-05 06:30:00 -0500" endDate="2026-01-05 06:30:00 -0500" value="80"/>
        | <Record type="HKQuantityTypeIdentifierBodyFatPercentage" sourceName="Scale" unit="%" startDate="2026-01-05 06:30:00 -0500" endDate="2026-01-05 06:30:00 -0500" value="0.18"/>
        | <Record type="HKQuantityTypeIdentifierBasalEnergyBurned" sourceName="Watch" unit="kcal" startDate="2026-01-05 23:00:00 -0500" endDate="2026-01-05 23:00:00 -0500" value="1650.4"/>
        | <Record type="HKCategoryTypeIdentifierMindfulSession" sourceName="Mind" startDate="2026-01-05 12:00:00 -0500" endDate="2026-01-05 12:10:30 -0500"/>
        | <Record type="HKCategoryTypeIdentifierMindfulSession" sourceName="Mind" startDate="2026-01-05 18:00:00 -0500" endDate="2026-01-05 18:05:00 -0500"/>
        | <Record type="HKQuantityTypeIdentifierRestingHeartRate" sourceName="Watch" unit="count/min" startDate="2025-12-01 07:00:00 -0500" endDate="2025-12-01 07:00:00 -0500" value="60"/>
        | <Record type="HKQuantityTypeIdentifierStepCount" sourceName="Watch" unit="count" startDate="2026-01-05 09:00:00 -0500" endDate="2026-01-05 09:00:00 -0500" value="4000"/>
        | <Workout workoutActivityType="HKWorkoutActivityTypeFunctionalStrengthTraining" duration="45.2" durationUnit="min" totalDistance="0" totalDistanceUnit="km" totalEnergyBurned="310" totalEnergyBurnedUnit="kcal" sourceName="Watch" startDate="2026-01-05 17:00:00 -0500" endDate="2026-01-05 17:45:00 -0500">
        |  <WorkoutStatistics type="HKQuantityTypeIdentifierHeartRate" average="131.5" minimum="90" maximum="160"/>
        | </Workout>
        | <Workout workoutActivityType="HKWorkoutActivityTypeRunning" duration="30" durationUnit="min" totalDistance="5" totalDistanceUnit="km" sourceName="Watch" startDate="2026-01-06 08:00:00 -0500" endDate="2026-01-06 08:30:00 -0500">
        |  <WorkoutStatistics type="HKQuantityTypeIdentifierActiveEnergyBurned" sum="280.7"/>
        | </Workout>
        | <Workout workoutActivityType="HKWorkoutActivityTypeCycling" duration="20" durationUnit="min" sourceName="Peloton App" startDate="2026-01-06 09:00:00 -0500" endDate="2026-01-06 09:20:00 -0500"/>
        | <Workout workoutActivityType="HKWorkoutActivityTypeRunning" duration="25" durationUnit="min" sourceName="Watch" startDate="2025-11-01 08:00:00 -0500" endDate="2025-11-01 08:25:00 -0500"/>
        |</HealthData>
        |""".stripMargin
    Files.write(dir.resolve("export.xml"), xml.getBytes(StandardCharsets.UTF_8))
    dir
  }

  private lazy val exportPath = writeExport().resolve("export.xml").toString

  test("dailyVitals: last-of-day for spot metrics, mean + rescale for SpO2") {
    val v = HealthKitXml.dailyVitals(
      HealthKitXml.readRecords(spark, exportPath)).collect()
    assert(v.map(_.getString(0)).toSeq == Seq("2025-12-01", "2026-01-05"))
    val jan5 = v.find(_.getString(0) == "2026-01-05").get
    // last-of-day RHR is the 21:00 reading, not the 07:00 one
    assert(jan5.getAs[Double]("resting_heart_rate_bpm") == 48.0)
    // mean of 0.97/0.99 → 0.98 fraction → 98.0 pct
    assert(jan5.getAs[Double]("blood_oxygen_pct") == 98.0)
    assert(jan5.isNullAt(jan5.fieldIndex("vo2_max")))
  }

  test("since filter drops strictly-older days only") {
    val recs = HealthKitXml.readRecords(spark, exportPath, since = Some("2026-01-01"))
    val days = recs.select("date").distinct().collect().map(_.getString(0)).toSet
    assert(days == Set("2026-01-05"))
  }

  test("dailyBody: kg→lbs, fraction→pct, BMR rounding, device name skips BMR source") {
    val b = HealthKitXml.dailyBody(
      HealthKitXml.readRecords(spark, exportPath)).collect()
    assert(b.length == 1)
    val r = b.head
    assert(r.getAs[Double]("weight_lbs") == math.rint(80 * 2.20462 * 10) / 10)
    assert(r.getAs[Double]("body_fat_pct") == 18.0)
    assert(r.getAs[Double]("bmr") == 1650.0)
    // BasalEnergyBurned came from "Watch" later in the day, but device_name
    // must reflect the last body-composition source: the Scale
    assert(r.getAs[String]("device_name") == "Scale")
  }

  test("dailyMindfulness sums spans and counts sessions") {
    val m = HealthKitXml.dailyMindfulness(
      HealthKitXml.readRecords(spark, exportPath)).collect()
    assert(m.length == 1)
    assert(m.head.getAs[Double]("duration_minutes") == 15.5)
    assert(m.head.getAs[Long]("session_count") == 2L)
  }

  test("workouts: snake_case type, km→mi, stats fallback, Peloton dropped, since filter") {
    val w = HealthKitXml.workouts(spark, exportPath, since = Some("2026-01-01"))
      .orderBy("start_time").collect()
    assert(w.length == 2) // Peloton and the 2025-11-01 run are gone
    val strength = w.head
    assert(strength.getAs[String]("workout_type") == "functional_strength_training")
    assert(strength.getAs[Long]("calories_burned") == 310L)
    assert(strength.getAs[Long]("avg_heart_rate") == 132L)
    assert(strength.getAs[String]("start_time") == "2026-01-05T17:00:00-05:00")
    val run = w(1)
    assert(run.getAs[Double]("distance_mi") == math.rint(5 * 0.621371 * 100) / 100)
    // no top-level totalEnergyBurned → falls back to WorkoutStatistics sum
    assert(run.getAs[Long]("calories_burned") == 281L)
  }
}
