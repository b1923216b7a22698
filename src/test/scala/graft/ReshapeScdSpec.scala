package graft

import graft.operators.{Reshape, Scd}
import org.apache.spark.sql.functions._

/** Value semantics for reshape and SCD2 beyond the oracles: dense-spine
  * invariants and the type-2 merge contract on a controlled dimension.
  */
class ReshapeScdSpec extends SparkSpec {
  import spark.implicits._

  test("q59 spine is gapless per user and forward-fill never regresses") {
    val out = Reshape.q59DateSpine(spark, Sf).collect()
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val days = rows.map(_.getAs[String]("day")).sorted
      val (first, last) = (days.head, days.last)
      val expected = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(first), java.time.LocalDate.parse(last)) + 1
      assert(days.length == expected, s"gap in spine between $first and $last")
      // first spine day is observed by construction (span starts at data)
      assert(rows.minBy(_.getAs[String]("day")).getAs[Int]("is_observed") == 1)
    }
    // densification must add rows iff the raw daily table has gaps
    val observed = out.count(_.getAs[Int]("is_observed") == 1)
    assert(observed < out.length, "sf0.001 events should leave calendar gaps")
  }

  test("scd2Apply closes changed rows, opens new versions, passes untouched rows through") {
    val dim = Seq(
      (1L, "a", 10.0, "2024-01-01", null.asInstanceOf[String], 1),
      (2L, "b", 20.0, "2024-01-01", null.asInstanceOf[String], 1),
      // pre-existing history row must survive untouched even for an updated key
      (1L, "a", 5.0, "2023-06-01", "2024-01-01", 0))
      .toDF("k", "name", "bal", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, 99.0)).toDF("k", "bal")
    val out = Scd.scd2Apply(dim, updates, "k", "2024-06-01")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("bal"),
        r.getAs[String]("valid_from"), r.getAs[String]("valid_to"),
        r.getAs[Int]("is_current")))
    assert(out.toSeq == Seq(
      (1L, 5.0, "2023-06-01", "2024-01-01", 0),   // history untouched
      (1L, 10.0, "2024-01-01", "2024-06-01", 0),  // closed
      (1L, 99.0, "2024-06-01", null, 1),          // new current version
      (2L, 20.0, "2024-01-01", null, 1)),         // untouched passthrough
      out.mkString(";"))
  }

  test("q60 keeps exactly one current row per key and full history for updated keys") {
    val out = Scd.q60Scd2(spark, Sf).cache()
    val perKey = out.groupBy("c_custkey")
      .agg(sum("is_current").as("n_cur"), count(lit(1)).as("n_rows"))
    assert(perKey.filter(col("n_cur") =!= 1).count() == 0, "exactly one open version per key")
    assert(perKey.filter(col("c_custkey") % 10 === 0 && col("n_rows") =!= 2).count() == 0,
      "updated keys must carry closed + reopened versions")
    assert(perKey.filter(col("c_custkey") % 10 =!= 0 && col("n_rows") =!= 1).count() == 0)
  }
}
