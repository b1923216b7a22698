package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedGroupBy equals plain groupBy on events") {
    val e = Tables.load(spark, Sf, "events")
    val salted = Skew.saltedGroupBy(e, "event_type", "event_id", 8,
      Map("value" -> Skew.sumAgg))
      .withColumn("value", round(col("value"), 6))
    val plain = e.groupBy("event_type").agg(round(sum("value"), 6).as("value"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty, "salted != plain")
  }

  test("saltedGroupBy count/max survive the two-phase combine") {
    val e = Tables.load(spark, Sf, "events")
    val salted = Skew.saltedGroupBy(e, "event_type", "event_id", 4,
      Map("event_id" -> Skew.countAgg, "value" -> Skew.maxAgg))
      .withColumnRenamed("event_id", "n")
    val plain = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("value").as("value"))
    assert(salted.exceptAll(plain).isEmpty)
  }

  test("saltedBroadcastJoin equals a plain join") {
    val e = Tables.load(spark, Sf, "events")
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
      ("error", -1.0), ("signup", 2.0)).toDF("event_type", "weight")
    val salted = Skew.saltedBroadcastJoin(e, dim, "event_type", "event_id", 4)
      .select("event_id", "weight")
    val plain = e.join(dim, Seq("event_type")).select("event_id", "weight")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty)
  }

  test("salting is deterministic: same row always gets the same salt") {
    val e = Tables.load(spark, Sf, "events").limit(100)
    val s1 = e.withColumn("s", pmod(xxhash64(col("event_id")), lit(8)))
      .select("event_id", "s")
    val s2 = e.withColumn("s", pmod(xxhash64(col("event_id")), lit(8)))
      .select("event_id", "s")
    assert(s1.exceptAll(s2).isEmpty)
  }
}
