package graft

import graft.operators.Windows

/** The fused single-scan rollup must be row-identical to the reference's
  * four-way FULL OUTER join formulation — the fusion is a plan
  * optimization, not a semantic change.
  */
class WindowsEquivalenceSpec extends SparkSpec {

  test("fused q12 rollup core equals the outer-join formulation") {
    val cols = Seq("user_id", "day", "views", "view_score",
      "purchases", "purchase_total", "clicks", "errors")
    val fused = Windows.q12DailyRollup(spark, Sf)
      .select(cols.head, cols.tail: _*)
    val joined = Windows.dailyRollupJoined(spark, Sf)
      .select(cols.head, cols.tail: _*)
    assert(fused.count() == joined.count())
    assert(fused.exceptAll(joined).isEmpty && joined.exceptAll(fused).isEmpty)
  }
}
