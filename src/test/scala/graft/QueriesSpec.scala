package graft

/** Every registered query must execute on sf0.001; the driver's DuckDB
  * oracle covers values at sf0.01 — this is the fast structural gate.
  */
class QueriesSpec extends SparkSpec {

  // q14/q21-q24 can be legitimately sparse at sf0.001; everything else
  // must produce rows.
  private val maybeEmpty = Set("q14_anomaly_zscore", "q21_dedup_minhash",
    "q22_dedup_simhash", "q23_ngram_jaccard", "q24_dedup_embedding")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, Sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!maybeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }
}
