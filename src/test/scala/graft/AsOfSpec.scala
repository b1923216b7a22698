package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("joinAsOf attaches the latest prior right row per key (vs brute force)") {
    val e = Tables.load(spark, Sf, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))

    val out = AsOf.joinAsOf(purchases, clicks, "user_id", "ts", "click_ts",
      Seq("click_value"))
    assert(out.count() == purchases.count(), "as-of join must preserve left cardinality")

    // brute-force oracle on collected rows (sf0.001 is small)
    val clickRows = clicks.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val expected = purchases.collect().map { p =>
      val uid = p.getAs[Long]("user_id")
      val t = p.getAs[java.sql.Timestamp]("ts").getTime
      val best = clickRows.filter(c => c._1 == uid && c._2 <= t)
        .sortBy(c => (c._2, c._3)).lastOption.map(_._3)
      (p.getAs[Long]("event_id"), best)
    }.toMap
    out.collect().foreach { r =>
      val eid = r.getAs[Long]("event_id")
      val got = Option(r.getAs[java.lang.Double]("click_value")).map(_.toDouble)
      assert(got == expected(eid), s"event $eid: got $got expected ${expected(eid)}")
    }
  }

  test("joinAsOf is inclusive at equal timestamps and null before any right row") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0")).toDF("k", "t", "name")
    val right = Seq((1L, 100L, 9.0), (1L, 80L, 5.0)).toDF("k", "rt", "v")
    val out = AsOf.joinAsOf(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("t").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("v")), "t=50 precedes all right rows")
    assert(out(1).getAs[Double]("v") == 9.0, "t=100 must see the rt=100 row (inclusive)")
  }

  test("joinAsOf: a newer right row with NULL payload wins over an older value") {
    import spark.implicits._
    val left = Seq((1L, 300L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 100L, Some(10.0)), (1L, 200L, Option.empty[Double]))
      .toDF("k", "rt", "v")
    val out = AsOf.joinAsOf(left, right, "k", "t", "rt", Seq("v")).collect()
    assert(out.length == 1)
    assert(out(0).isNullAt(out(0).fieldIndex("v")),
      "the rt=200 NULL observation is the as-of value; 10.0 would be stale")
  }

  test("joinAsOf plans one shuffle on the key, no range explosion") {
    val e = Tables.load(spark, Sf, "events")
    val l = e.filter(col("event_type") === "purchase").select("user_id", "ts", "value")
    val r = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("rts"), col("value").as("rv"))
    val p = planString(AsOf.joinAsOf(l, r, "user_id", "ts", "rts", Seq("rv")))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "as-of must not be a join at the physical layer")
    assert(p.contains("Window"), p.take(300))
  }
}
