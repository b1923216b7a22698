package graft.operators

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed exact-EMA training load: CTL/ATL as exponential moving averages
  * (pandas ewm(span, adjust=False) semantics), TSB = CTL − ATL, and the
  * four-way form classification.
  * (reference: insights_engine/insights/training_load.py:21-41 —
  * compute_ema / classify_form; q13 is the windowed approximation, this is
  * the exact recursive form.)
  *
  * An EMA is a sequential recurrence, so it cannot be a plain window
  * aggregate; the idiomatic distributed shape is
  * `Dataset.groupByKey(entity).flatMapGroups` — each entity's series folds
  * sequentially inside one task, entities parallelize across the cluster.
  * Per-group state is one series (bounded: days per user), not the corpus.
  */
object TrainingLoad {

  case class DailyLoad(user_id: Long, day: String, daily_load: Double)
  case class LoadState(user_id: Long, day: String, daily_load: Double,
                       ctl: Double, atl: Double, tsb: Double, form: String)

  val CtlSpan = 42
  val AtlSpan = 7

  def classifyForm(tsb: Double): String =
    if (tsb > 15) "fresh"
    else if (tsb >= 0) "neutral"
    else if (tsb >= -15) "building"
    else "fatigued"

  /** ewm(span, adjust=False): y_0 = x_0; y_t = α·x_t + (1−α)·y_{t−1}. */
  def emaFold(xs: Seq[Double], span: Int): Seq[Double] = {
    val alpha = 2.0 / (span + 1)
    xs.headOption match {
      case None => Seq.empty
      case Some(h) =>
        xs.tail.scanLeft(h)((prev, x) => alpha * x + (1 - alpha) * prev)
    }
  }

  private def round4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** Exact CTL/ATL/TSB per user from the purchase-event daily load. */
  def trainingLoadEma(s: SparkSession, dir: String): Dataset[LoadState] = {
    import s.implicits._
    val daily: Dataset[DailyLoad] = Tables.load(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(Num.sumD(col("value"), 2).as("daily_load"))
      .as[DailyLoad]
    daily.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      val series = it.toSeq.sortBy(_.day)
      val loads = series.map(_.daily_load)
      val ctl = emaFold(loads, CtlSpan)
      val atl = emaFold(loads, AtlSpan)
      series.lazyZip(ctl).lazyZip(atl).map { (d, c, a) =>
        val tsb = c - a
        LoadState(d.user_id, d.day, d.daily_load,
          round4(c), round4(a), round4(tsb), classifyForm(tsb))
      }
    }
  }

  def asDf(s: SparkSession, dir: String): DataFrame =
    trainingLoadEma(s, dir).toDF().orderBy("user_id", "day")
}
