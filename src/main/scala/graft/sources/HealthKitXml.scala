package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HealthKit-export XML ingest on Spark 4's built-in XML source.
  *
  * Re-expresses the reference's streaming lxml parser
  * (reference: scripts/parse_healthkit_export.py:305-450 — iterparse over
  * `<Record>`/`<Workout>` elements; :173-298 — driver-side accumulators
  * aggregating to four daily CSVs) as a distributed read plus declarative
  * aggregations:
  *
  *   - `spark.read.format("xml").option("rowTag", "Record")` splits the
  *     file across tasks and parses elements in parallel — the reference's
  *     single-threaded 15 s/2 GB scan becomes cluster-wide.
  *   - The `--since` incremental filter (parse_healthkit_export.py:337-341)
  *     is a relational predicate applied straight after the scan, before
  *     any shuffle. XML rows must still be tokenized to see their
  *     attributes (true of iterparse as well), so the win is the same as
  *     the reference's: skipped records cost a parse and nothing else.
  *   - The per-day accumulator dicts become single-pass conditional
  *     aggregations (`max_by` for last-of-day, `avg` for means) — one
  *     shuffle keyed by day, no driver state, no document-order
  *     dependence.
  *
  * Schemas are explicit: inference would cost a second full pass over a
  * multi-GB export.
  */
object HealthKitXml {

  /** HKQuantityTypeIdentifier* → output metric, for the daily-vitals table
    * (reference: parse_healthkit_export.py:57-63).
    */
  val VitalTypes: Map[String, String] = Map(
    "HKQuantityTypeIdentifierRestingHeartRate" -> "resting_heart_rate_bpm",
    "HKQuantityTypeIdentifierHeartRateVariabilitySDNN" -> "hrv_ms",
    "HKQuantityTypeIdentifierVO2Max" -> "vo2_max",
    "HKQuantityTypeIdentifierOxygenSaturation" -> "blood_oxygen_pct",
    "HKQuantityTypeIdentifierRespiratoryRate" -> "respiratory_rate")

  /** Metrics averaged over the day; the rest take the last value of the day
    * (reference: parse_healthkit_export.py:75-81).
    */
  val MeanVitals: Set[String] = Set("blood_oxygen_pct", "respiratory_rate")

  /** Body-composition types → output field
    * (reference: parse_healthkit_export.py:65-73).
    */
  val BodyTypes: Map[String, String] = Map(
    "HKQuantityTypeIdentifierBodyMass" -> "weight",
    "HKQuantityTypeIdentifierBodyFatPercentage" -> "body_fat_pct",
    "HKQuantityTypeIdentifierBodyMassIndex" -> "bmi",
    "HKQuantityTypeIdentifierLeanBodyMass" -> "lean_body_mass",
    "HKQuantityTypeIdentifierBasalEnergyBurned" -> "bmr",
    "HKQuantityTypeIdentifierAppleStandingHeight" -> "height")

  private val MindfulType = "HKCategoryTypeIdentifierMindfulSession"
  private val KgToLbs = 2.20462
  private val KmToMi = 0.621371

  private val recordSchema = StructType(Seq(
    StructField("_type", StringType),
    StructField("_startDate", StringType),
    StructField("_endDate", StringType),
    StructField("_value", StringType),
    StructField("_unit", StringType),
    StructField("_sourceName", StringType)))

  private val workoutSchema = StructType(Seq(
    StructField("_workoutActivityType", StringType),
    StructField("_startDate", StringType),
    StructField("_endDate", StringType),
    StructField("_duration", StringType),
    StructField("_totalEnergyBurned", StringType),
    StructField("_totalDistance", StringType),
    StructField("_totalDistanceUnit", StringType),
    StructField("_sourceName", StringType),
    StructField("WorkoutStatistics", ArrayType(StructType(Seq(
      StructField("_type", StringType),
      StructField("_average", StringType),
      StructField("_sum", StringType)))))))

  /** Apple Health timestamps look like "2025-11-25 08:30:00 -0500"; the
    * reference keys every daily table on the first 10 chars
    * (parse_healthkit_export.py:108-112).
    */
  private def dayOf(ts: Column): Column =
    when(ts.isNotNull, substring(ts, 1, 10))

  /** Local-time timestamp (offset dropped) — what the reference's
    * mindfulness duration arithmetic uses (parse_healthkit_export.py:364).
    */
  private def localTs(ts: Column): Column =
    to_timestamp(substring(ts, 1, 19), "yyyy-MM-dd HH:mm:ss")

  /** "2025-11-25 08:30:00 -0500" → "2025-11-25T08:30:00-05:00"
    * (reference: parse_healthkit_export.py:115-127).
    */
  private def isoTs(ts: Column): Column =
    when(ts.isNotNull, regexp_replace(ts,
      "^(\\S+) (\\S+) ([+-]\\d{2})(\\d{2})$", "$1T$2$3:$4"))

  /** Keep rows on/after `since` by start-date day; rows with no startDate
    * pass, matching the reference's skip condition
    * (parse_healthkit_export.py:337-341).
    */
  private def sinceFilter(df: DataFrame, since: Option[String]): DataFrame =
    since.fold(df)(s =>
      df.filter(col("start_date").isNull || dayOf(col("start_date")) >= lit(s)))

  /** All `<Record>` elements with typed value and day columns. `since` is
    * the reference's `--since` incremental flag.
    */
  def readRecords(spark: SparkSession, path: String,
                  since: Option[String] = None): DataFrame = {
    val raw = spark.read.format("xml")
      .option("rowTag", "Record")
      .schema(recordSchema)
      .load(path)
      .select(
        col("_type").as("record_type"),
        col("_startDate").as("start_date"),
        col("_endDate").as("end_date"),
        col("_value").cast(DoubleType).as("value"),
        col("_unit").as("unit"),
        col("_sourceName").as("source_name"))
    sinceFilter(raw, since).withColumn("date", dayOf(col("start_date")))
  }

  /** Daily vitals: one row per day, one column per metric; last-of-day for
    * spot metrics, mean for continuous ones, SpO2 rescaled from fraction
    * (reference: parse_healthkit_export.py:202-224). One conditional-agg
    * pass — no pivot's two jobs, no per-metric scan.
    *
    * Last-of-day is `max_by(value, start_date)`: the reference takes the
    * last value in document order, which for HealthKit exports is
    * startDate order; keying on the timestamp makes the result
    * partition-order independent.
    */
  def dailyVitals(records: DataFrame): DataFrame = {
    val vitals = records.filter(
      col("record_type").isin(VitalTypes.keys.toSeq: _*) && col("value").isNotNull)
    val metricCols = VitalTypes.toSeq.sortBy(_._2).map { case (hk, name) =>
      val v = when(col("record_type") === hk, col("value"))
      val agg =
        if (MeanVitals(name)) avg(v)
        else max_by(v, when(col("record_type") === hk, col("start_date")))
      val scaled =
        if (name == "blood_oxygen_pct")
          when(agg <= 1.0, round(agg * 100, 1)).otherwise(round(agg, 2))
        else round(agg, 2)
      scaled.as(name)
    }
    vitals.groupBy("date")
      .agg(metricCols.head, metricCols.tail: _*)
      .orderBy("date")
  }

  /** Daily body composition: last-of-day per metric with the reference's
    * unit conversions (kg→lbs, fraction→pct, cm/m→in), device name from
    * the last non-BMR body record of the day
    * (reference: parse_healthkit_export.py:226-285).
    */
  def dailyBody(records: DataFrame): DataFrame = {
    val body = records.filter(
      col("record_type").isin(BodyTypes.keys.toSeq: _*) && col("value").isNotNull)

    def lastOf(field: String, of: Column): Column = {
      val m = col("record_type") === BodyTypes.find(_._2 == field).get._1
      max_by(when(m, of), when(m, col("start_date")))
    }
    val lbs = (f: String) => {
      val v = lastOf(f, col("value"))
      val u = lastOf(f, col("unit"))
      round(when(u === "kg", v * KgToLbs).otherwise(v), 1)
    }
    val heightV = lastOf("height", col("value"))
    val heightU = lastOf("height", col("unit"))
    val devName = {
      val m = col("record_type").isin(BodyTypes.keys.toSeq: _*) &&
        col("record_type") =!= "HKQuantityTypeIdentifierBasalEnergyBurned" &&
        col("source_name").isNotNull
      max_by(when(m, col("source_name")), when(m, col("start_date")))
    }
    body.groupBy("date").agg(
      lbs("weight").as("weight_lbs"),
      round(when(lastOf("body_fat_pct", col("value")) <= 1.0,
          lastOf("body_fat_pct", col("value")) * 100)
        .otherwise(lastOf("body_fat_pct", col("value"))), 1).as("body_fat_pct"),
      round(lastOf("bmi", col("value")), 1).as("bmi"),
      lbs("lean_body_mass").as("lean_body_mass_lbs"),
      round(lastOf("bmr", col("value")), 0).as("bmr"),
      round(when(heightU === "m", heightV * 39.3701)
        .when(heightU === "in", heightV)
        .otherwise(heightV / 2.54), 1).as("height_in"),
      coalesce(devName, lit("")).as("device_name"))
      .orderBy("date")
  }

  /** Daily mindfulness: session count + summed minutes from the category
    * records' start/end spans (reference: parse_healthkit_export.py:359-368).
    */
  def dailyMindfulness(records: DataFrame): DataFrame =
    records.filter(col("record_type") === MindfulType &&
        col("start_date").isNotNull && col("end_date").isNotNull)
      .withColumn("duration_min",
        (unix_timestamp(localTs(col("end_date"))) -
          unix_timestamp(localTs(col("start_date")))) / 60.0)
      .groupBy("date")
      .agg(
        round(sum("duration_min"), 1).as("duration_minutes"),
        count(lit(1)).as("session_count"))
      .orderBy("date")

  /** `<Workout>` elements → the workouts table: snake_case activity type,
    * km→mi, avg HR and fallback calories pulled from the nested
    * WorkoutStatistics array with `filter`/`element_at` (no explode — the
    * array never leaves its row), Peloton sources dropped
    * (reference: parse_healthkit_export.py:383-445).
    */
  def workouts(spark: SparkSession, path: String,
               since: Option[String] = None): DataFrame = {
    val raw = spark.read.format("xml")
      .option("rowTag", "Workout")
      .schema(workoutSchema)
      .load(path)
      .select(
        col("_workoutActivityType").as("activity_raw"),
        col("_startDate").as("start_date"),
        col("_endDate").as("end_date"),
        col("_duration").cast(DoubleType).as("duration"),
        col("_totalEnergyBurned").cast(DoubleType).as("calories"),
        col("_totalDistance").cast(DoubleType).as("distance"),
        col("_totalDistanceUnit").as("distance_unit"),
        col("_sourceName").as("source_name"),
        col("WorkoutStatistics").as("stats"))

    def stat(statType: String, field: String): Column =
      get(filter(col("stats"),
        s => s.getField("_type") === s"HKQuantityTypeIdentifier$statType"), lit(0))
        .getField(field).cast(DoubleType)

    sinceFilter(raw, since)
      .filter(!lower(coalesce(col("source_name"), lit(""))).contains("peloton"))
      .withColumn("avg_hr_d", stat("HeartRate", "_average"))
      .withColumn("stat_cal", stat("ActiveEnergyBurned", "_sum"))
      .select(
        dayOf(col("start_date")).as("date"),
        isoTs(col("start_date")).as("start_time"),
        isoTs(col("end_date")).as("end_time"),
        lower(regexp_replace(
          regexp_replace(col("activity_raw"), "^HKWorkoutActivityType", ""),
          "(?<=[a-z0-9])(?=[A-Z])", "_")).as("workout_type"),
        round(col("duration"), 1).as("duration_minutes"),
        when(coalesce(col("calories"), col("stat_cal")).isNotNull,
          round(coalesce(col("calories"), col("stat_cal")), 0).cast(LongType))
          .as("calories_burned"),
        when(col("avg_hr_d").isNotNull,
          round(col("avg_hr_d"), 0).cast(LongType)).as("avg_heart_rate"),
        when(col("distance_unit") === "mi", round(col("distance"), 2))
          .otherwise(round(col("distance") * KmToMi, 2)).as("distance_mi"),
        coalesce(col("source_name"), lit("")).as("source_app"))
  }
}
