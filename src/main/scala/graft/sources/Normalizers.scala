package graft.sources

import graft.{Num, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-normalizer transforms — the per-source Silver-layer derivations
  * the reference spreads across its Glue jobs (reference:
  * glue/peloton_normalizer.py:100-160 — raw workout-timestamp regexp
  * split and UTC rebuild; glue/bio_etl_utils.py:262-311 — workout
  * category map, output-per-minute, HR zones;
  * glue/mfp_normalizer.py:113-176 — meal-level dedup, daily totals,
  * macro-calorie ratios; glue/healthkit_normalizer.py:126-141,175-188 —
  * cross-source exclusion filter and body-composition forward-fill).
  *
  * All are row-local column derivations (scan-speed, codegen'd, no
  * shuffle) except [[mealToDaily]], which is one partial-aggregated
  * groupBy — at 100 TB each stays a single pass over the source files.
  */
object Normalizers {

  /** snake_case header normalization — the shared regex every normalizer
    * applies first (reference: mfp_normalizer.py:66-68, identical in the
    * ingestion trigger and the other Glue jobs).
    */
  def snakeCaseColumns(df: DataFrame): DataFrame = {
    val renamed = df.columns.map { c =>
      c -> c.trim.replaceAll("[.\\s/()]+", "_").toLowerCase.replaceAll("^_+|_+$", "")
    }
    // Two distinct raw headers collapsing to one snake name ('Total Time'
    // and 'total.time' -> total_time) would silently produce an ambiguous
    // column that only fails at resolution time — fail fast with the pair.
    renamed.groupBy(_._2).foreach { case (snake, raws) =>
      require(raws.length == 1,
        s"snakeCaseColumns: headers ${raws.map(r => s"'${r._1}'").mkString(", ")} " +
          s"all normalize to '$snake' — disambiguate the source headers")
    }
    renamed.foldLeft(df) { case (d, (c, snake)) =>
      if (snake != c) d.withColumnRenamed(c, snake) else d
    }
  }

  /** Collision-tolerant variant of [[snakeCaseColumns]] (ADVICE r6): when
    * two raw headers normalize to the same snake name, later ones take a
    * positional suffix (`total_time`, `total_time_2`, …) instead of
    * failing the ingest. The default stays fail-fast — ambiguity should
    * be fixed at the source — but a recovery path needs to land the file
    * first to inspect it.
    */
  def snakeCaseColumnsDedup(df: DataFrame): DataFrame = {
    // `used` records every ASSIGNED name, and suffixed candidates probe it
    // until free — a positional suffix alone can itself collide with a
    // later raw column (headers "Total Time", "total.time", "total_time_2"
    // must not yield two total_time_2 columns — ADVICE r7).
    val used = scala.collection.mutable.Set.empty[String]
    val renamed = df.columns.map { c =>
      val snake =
        c.trim.replaceAll("[.\\s/()]+", "_").toLowerCase.replaceAll("^_+|_+$", "")
      val name =
        if (!used(snake)) snake
        else Iterator.from(2).map(n => s"${snake}_$n").find(!used(_)).get
      used += name
      c -> name
    }
    df.toDF(renamed.map(_._2): _*)
  }

  /** Split a raw workout timestamp like `2026-02-21 07:25 (-05)` into a
    * date part, a time-of-day part, and a rebuilt UTC timestamp string —
    * regexp extraction because the raw suffix varies between offsets and
    * zone names (reference: peloton_normalizer.py:100-141).
    */
  def parseWorkoutTimestamp(df: DataFrame, raw: String): DataFrame =
    df.withColumn("workout_date", regexp_extract(col(raw), "^(\\d{4}-\\d{2}-\\d{2})", 1))
      .withColumn("workout_time",
        regexp_extract(col(raw), "\\d{4}-\\d{2}-\\d{2}\\s+(\\d{2}:\\d{2}(?::\\d{2})?)", 1))
      .withColumn("workout_ts_utc",
        when(col("workout_time") =!= "",
          concat_ws(" ", col("workout_date"), col("workout_time")))
          .otherwise(col("workout_date")))

  /** Discipline → normalized category, unmapped falls to 'other'
    * (reference: bio_etl_utils.py:262-278 — a literal map lookup; the
    * HealthKit variant at healthkit_normalizer.py:131-141 is the same
    * shape over its own map).
    */
  def categorizeWorkout(df: DataFrame, disciplineCol: String,
                        mapping: Map[String, String]): DataFrame = {
    val m = typedLit(mapping)
    df.withColumn("workout_category",
      coalesce(m(lower(col(disciplineCol))), lit("other")))
  }

  /** output_per_minute = total output / duration, null-guarded
    * (reference: bio_etl_utils.py:286-294). [[Num.roundD]] instead of
    * engine ROUND so oracle replays agree.
    */
  def outputPerMinute(df: DataFrame, output: String, minutes: String): DataFrame =
    df.withColumn("output_per_minute",
      when(col(minutes).isNotNull && col(minutes) > 0,
        Num.roundD(col(output) / col(minutes), 2)))

  /** Average-HR → training zone 1-5 at %-of-max bands
    * (reference: bio_etl_utils.py:297-311).
    */
  def hrZones(df: DataFrame, hr: String, maxHr: Int = 200): DataFrame =
    df.withColumn("hr_zone",
      when(col(hr).isNull, lit(null))
        .when(col(hr) < maxHr * 0.6, 1)
        .when(col(hr) < maxHr * 0.7, 2)
        .when(col(hr) < maxHr * 0.8, 3)
        .when(col(hr) < maxHr * 0.9, 4)
        .otherwise(5))

  /** Cross-source exclusion — drop rows whose source app matches another
    * normalizer's source, case-insensitively (reference:
    * healthkit_normalizer.py:126-128, the belt-and-suspenders Peloton
    * filter).
    */
  def excludeSource(df: DataFrame, sourceCol: String, needle: String): DataFrame =
    df.filter(!lower(col(sourceCol)).contains(needle.toLowerCase))

  /** Meal-level nutrition rows → daily totals with macro-calorie ratios
    * (reference: mfp_normalizer.py:113-176): exact-duplicate (date, meal)
    * rows from overlapping exports collapse first, numeric columns SUM to
    * the day, meals_logged joins the distinct meal names, and each macro
    * contributes its caloric share (protein/carbs 4 cal/g, fat 9 cal/g).
    */
  def mealToDaily(df: DataFrame, numericCols: Seq[String]): DataFrame = {
    val deduped = df.dropDuplicates("date", "meal")
    def pct(grams: Column, calPerG: Double): Column =
      when(col("calories").isNotNull && col("calories") > 0,
        Num.roundD(grams * calPerG / col("calories") * 100, 1))
    deduped.groupBy("date")
      .agg(
        Num.exactSum(col(numericCols.head)).cast("double").as(numericCols.head),
        numericCols.tail.map(c => Num.exactSum(col(c)).cast("double").as(c)) ++ Seq(
          count(lit(1)).as("meal_count"),
          concat_ws(",", sort_array(collect_set(col("meal")))).as("meals_logged")): _*)
      .withColumn("protein_pct", pct(col("protein_g"), 4.0))
      .withColumn("carb_pct", pct(col("carbohydrates_g"), 4.0))
      .withColumn("fat_pct", pct(col("fat_g"), 9.0))
  }

  /** Body-composition daily frame: sporadic measurements forward-fill so
    * weight-only days keep the last composition (reference:
    * healthkit_normalizer.py:175-188; delegates to [[Ingest.forwardFill]],
    * the shared bio_etl_utils.forward_fill analog).
    */
  def bodyDaily(df: DataFrame, fillCols: Seq[String]): DataFrame =
    Ingest.forwardFill(df, None, "date", fillCols)

  /** The §3 mapping of the workout-category map — event types standing in
    * for fitness disciplines.
    */
  private[graft] val categoryMap: Map[String, String] = Map(
    "purchase" -> "strength_training",
    "click" -> "cardio_high",
    "view" -> "cardio_low",
    "signup" -> "recovery")

  /** q80: the peloton normalizer's derivation chain as one registered
    * scan query — raw timestamp string → regexp split → rebuilt UTC
    * string, discipline → category, output/minute, HR zone. The raw
    * timestamp is REBUILT from the typed events.ts (suffix ` (-05)`) and
    * then re-parsed, so the oracle machine-checks the regexp round-trip
    * on every row; duration/HR analogs are deterministic arithmetic on
    * the event value. One projection over one scan: no exchange at any
    * scale (ORDER BY is the harness determinism requirement, SURVEY §4).
    */
  def q80WorkoutNormalize(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(s, dir, "events")
      .withColumn("raw_ts",
        concat(date_format(col("ts"), "yyyy-MM-dd HH:mm"), lit(" (-05)")))
      .withColumn("length_minutes",
        when(col("value") % 60 >= 1, floor(col("value") % 60).cast("int")))
      .withColumn("avg_heartrate", (lit(60.0) + col("value") % 140).cast("double"))
    val parsed = hrZones(
      outputPerMinute(
        categorizeWorkout(parseWorkoutTimestamp(raw, "raw_ts"), "event_type", categoryMap),
        "value", "length_minutes"),
      "avg_heartrate")
    parsed.select(
        col("user_id"), col("event_id"), col("raw_ts"),
        col("workout_date"), col("workout_time"), col("workout_ts_utc"),
        col("event_type"), col("workout_category"),
        Num.roundD(col("value"), 2).as("total_output"),
        col("length_minutes"), col("output_per_minute"),
        col("avg_heartrate"), col("hr_zone").cast("int").as("hr_zone"))
      .orderBy("user_id", "event_id")
  }

  val q80Sql: String = {
    val cat = categoryMap.map { case (k, v) => s"WHEN LOWER(event_type) = '$k' THEN '$v'" }
      .mkString("CASE ", " ", " ELSE 'other' END")
    s"""WITH raw AS (
       |  SELECT user_id, event_id, event_type, value,
       |    STRFTIME(ts, '%Y-%m-%d %H:%M') || ' (-05)' AS raw_ts,
       |    CASE WHEN MOD(value, 60) >= 1 THEN CAST(FLOOR(MOD(value, 60)) AS INT) END AS length_minutes,
       |    60.0 + MOD(value, 140) AS avg_heartrate
       |  FROM events),
       |parsed AS (
       |  SELECT *,
       |    COALESCE(regexp_extract(raw_ts, '^(\\d{4}-\\d{2}-\\d{2})', 1), '') AS workout_date,
       |    COALESCE(regexp_extract(raw_ts, '\\d{4}-\\d{2}-\\d{2}\\s+(\\d{2}:\\d{2}(?::\\d{2})?)', 1), '') AS workout_time
       |  FROM raw)
       |SELECT user_id, event_id, raw_ts, workout_date, workout_time,
       |  CASE WHEN workout_time <> '' THEN workout_date || ' ' || workout_time
       |       ELSE workout_date END AS workout_ts_utc,
       |  event_type, $cat AS workout_category,
       |  ${Num.sqlRoundD("value", 2)} AS total_output,
       |  length_minutes,
       |  CASE WHEN length_minutes IS NOT NULL AND length_minutes > 0
       |       THEN ${Num.sqlRoundD("value / length_minutes", 2)} END AS output_per_minute,
       |  avg_heartrate,
       |  CASE WHEN avg_heartrate IS NULL THEN NULL
       |       WHEN avg_heartrate < 120.0 THEN 1
       |       WHEN avg_heartrate < 140.0 THEN 2
       |       WHEN avg_heartrate < 160.0 THEN 3
       |       WHEN avg_heartrate < 180.0 THEN 4
       |       ELSE 5 END AS hr_zone
       |FROM parsed
       |ORDER BY user_id, event_id""".stripMargin
  }
}
