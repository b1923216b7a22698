package graft

import org.apache.spark.sql.functions._

/** The scale-rehearsal replicator's contract: replicas preserve the
  * source distributions exactly where they must (token multisets,
  * within-replica cosine structure) and break similarity exactly where
  * they must (no shingle overlap, no cross-replica semantic twins).
  */
class ScaleUpSpec extends SparkSpec {

  test("scaleDocuments preserves token multisets but no 3-shingles, deterministically") {
    import spark.implicits._
    val d = Tables.load(spark, Sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val up = ScaleUp.scaleDocuments(d, 2)
    assert(up.count() == 2 * d.count())

    // replica k=1 of each doc: same token MULTISET (sorted tokens equal)…
    val srcSorted = d.select(col("doc_id"),
      array_join(array_sort(split(col("text"), " ")), " ").as("sorted"))
    val repSorted = up.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("doc_id"),
        array_join(array_sort(split(col("text"), " ")), " ").as("rsorted"))
    val joined = srcSorted.join(repSorted, "doc_id")
    assert(joined.filter(col("sorted") =!= col("rsorted")).count() == 0,
      "replica token multiset must equal its source's")

    // …but w.h.p. no shared word 3-shingles (the permutation is the
    // point: replicas must NOT read as near-dups of their source)
    def shingles(df: org.apache.spark.sql.DataFrame, idCol: String) = df
      .withColumn("w", split(col("text"), " "))
      .select(col(idCol),
        explode(expr("transform(sequence(1, size(w) - 2), i -> array_join(slice(w, i, 3), ' '))"))
          .as("sh"))
    val shared = shingles(d, "doc_id")
      .join(shingles(up.filter(col("doc_id") >= 1000000L)
          .withColumn("doc_id", col("doc_id") - 1000000L), "doc_id"),
        Seq("doc_id", "sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    // a handful of coincidental repeats are fine; wholesale overlap is not
    val worst = shared.agg(max("n")).as[Long].collect().headOption.getOrElse(0L)
    assert(worst <= 3, s"replica shares up to $worst 3-shingles with its source")

    // deterministic: a second invocation is byte-identical
    val up2 = ScaleUp.scaleDocuments(d, 2)
    assert(up.exceptAll(up2).count() == 0 && up2.exceptAll(up).count() == 0)
  }

  test("scaleEvents replicates along the user axis with per-user series verbatim") {
    val ev = Tables.load(spark, Sf, "events").filter(col("user_id") < 5)
    val up = ScaleUp.scaleEvents(ev, 3)
    assert(up.count() == 3 * ev.count())
    assert(up.select("event_id").distinct().count() == up.count(),
      "event ids must stay unique across replicas")
    // a replica user's series is its source user's, verbatim: every
    // windowed result over the replica therefore equals the source's
    val src = ev.select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val rep = up.filter(col("user_id") >= 1000000L && col("user_id") < 2000000L)
      .select((col("user_id") - 1000000L).as("user_id"),
        col("ts"), col("event_type"), col("value"))
    assert(src.exceptAll(rep).count() == 0 && rep.exceptAll(src).count() == 0)
  }

  test("scaleEmbeddings: within-replica cosines exact, cross-replica twins destroyed") {
    import spark.implicits._
    val e = Tables.load(spark, Sf, "embeddings").filter(col("vec_id") < 20)
    val up = ScaleUp.scaleEmbeddings(e, 2).withColumn("emb",
      expr("transform(embedding, x -> cast(x as double))"))

    def dot(a: String, b: String) = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
    val src = up.filter(col("vec_id") < 20)
      .select(col("vec_id").as("i"), col("emb").as("ea"))
    val rep = up.filter(col("vec_id") >= 1000000L)
      .select((col("vec_id") - 1000000L).as("i"), col("emb").as("eb"))

    // the reflection is an isometry: pairwise dots WITHIN the replica
    // equal the source corpus' dots bit-for-bit (x * -1 is exact)
    val sPairs = src.crossJoin(src.select(col("i").as("j"), col("ea").as("ea2")))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), dot("ea", "ea2").as("d_src"))
    val rPairs = rep.crossJoin(rep.select(col("i").as("j"), col("eb").as("eb2")))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), dot("eb", "eb2").as("d_rep"))
    val mism = sPairs.join(rPairs, Seq("i", "j"))
      .filter(col("d_src") =!= col("d_rep")).count()
    assert(mism == 0, "within-replica dot products must equal the source's exactly")

    // a vector and its own reflection are ~orthogonal (no semantic twin):
    // |cos| stays far from the 0.99 dedup threshold
    val selfCos = src.join(rep, "i")
      .select((dot("ea", "eb") / sqrt(dot("ea", "ea") * dot("eb", "eb"))).as("c"))
      .agg(max(abs(col("c")))).as[Double].collect().head
    assert(selfCos < 0.9, s"reflection must not be a near-dup of its source (|cos| = $selfCos)")
  }
}
