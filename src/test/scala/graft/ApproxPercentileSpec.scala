package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** q43's contract: each sketched quantile must satisfy the Greenwald-
  * Khanna rank guarantee — the returned value's rank in the exact
  * distribution lies within ε·n (ε = 1/accuracy) of the target rank.
  * Checked directly on ranks (the sketch returns genuine data elements,
  * so a value-space bracket against the interpolating exact percentile
  * would be wrong at discreteness boundaries).
  */
class ApproxPercentileSpec extends SparkSpec {

  test("q43 approx percentiles satisfy the sketch's rank guarantee vs exact data") {
    val eps = 1.0 / Analytics.ApproxAccuracy
    val events = graft.Tables.load(spark, Sf, "events").select("event_type", "value").cache()
    val approxRows = Analytics.q43PercentilesApprox(spark, Sf).collect()
    assert(approxRows.nonEmpty)
    approxRows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val group = events.filter(col("event_type") === et)
      val n = group.count().toDouble
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (name, p) =>
        val v = r.getAs[Double](name)
        val le = group.filter(col("value") <= v + 1e-4).count() / n
        val lt = group.filter(col("value") < v - 1e-4).count() / n
        // rank of v must reach p - ε (enough mass at or below) and not
        // overshoot p + ε (not too much mass strictly below); 1/n covers
        // the discrete step of a single element
        assert(le >= p - eps - 1.0 / n,
          s"$et $name: value $v has too little mass below (${le})")
        assert(lt <= p + eps + 1.0 / n,
          s"$et $name: value $v has too much mass below (${lt})")
      }
    }
  }
}
