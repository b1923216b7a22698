package graft

import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  private def emb = Tables.load(spark, Sf, "embeddings")
    .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))

  test("cosine_sim matches the composable zip_with/aggregate formulation") {
    val fold = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) /
      sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x) *
        aggregate(zip_with(col("b"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
    val pairs = emb.limit(20).select(col("vec_id").as("ia"), col("emb").as("a"))
      .crossJoin(emb.limit(20).select(col("vec_id").as("ib"), col("emb").as("b")))
    val diff = pairs
      .select(abs(call_function("cosine_sim", col("a"), col("b")) - fold).as("d"))
      .agg(max("d")).first().getDouble(0)
    assert(diff < 1e-9, s"max |native - fold| = $diff")
  }

  test("cosine_sim is registered on the SQL surface") {
    emb.createOrReplaceTempView("emb_fn_test")
    val v = spark.sql(
      "SELECT cosine_sim(emb, emb) AS c FROM emb_fn_test LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(v.forall(c => math.abs(c - 1.0) < 1e-12), v.mkString(","))
  }

  test("cosine_sim self-similarity is 1 and zero-vector guard returns 0") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))
    ).toDF("a", "b")
    val out = df.select(call_function("cosine_sim", col("a"), col("b"))).as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(out(2) == 0.0)
  }

  test("cosine_sim stays inside whole-stage codegen") {
    val p = planString(emb.select(call_function("cosine_sim", col("emb"), col("emb"))))
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan toString
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(p).isDefined, p.take(400))
  }

  test("md5_long60 equals the composable conv(substring(md5)) formulation") {
    // the native expression must be bit-identical to what the DuckDB
    // oracle replays: first 15 hex chars of md5, parsed base 16
    val d = Tables.load(spark, Sf, "documents")
      .select(col("text"),
        call_function("md5_long60", col("text")).as("native"),
        expr("cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint)").as("composed"))
    assert(d.filter(col("native") =!= col("composed")).count() == 0)
    assert(d.filter(col("native") < 0 || col("native") >= expr("cast(pow(2, 60) as bigint)")).count() == 0)
    // empty string: fixed md5, stable value
    import spark.implicits._
    val e = Seq("").toDF("s")
      .select(call_function("md5_long60", col("s"))).as[Long].first()
    assert(e == java.lang.Long.parseUnsignedLong("d41d8cd98f00b20", 16))
  }

  test("md5_long60 stays inside whole-stage codegen") {
    val p = planString(Tables.load(spark, Sf, "documents")
      .select(call_function("md5_long60", col("text"))))
    assert("""\*\(\d+\) Project \[md5_long60""".r.findFirstIn(p).isDefined, p.take(400))
  }

  test("dot_dec equals the composable aggregate(zip_with) decimal fold bit-for-bit") {
    val e = Tables.load(spark, Sf, "embeddings")
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("emb2", expr("transform(embedding, x -> cast(x as double) * 1.01)"))
    val d = e.select(
      call_function("dot_dec", col("emb"), col("emb2")).as("native"),
      expr("aggregate(zip_with(emb, emb2, (x, y) -> cast(x * y as decimal(25,12)))," +
        " cast(0 as decimal(25,12)), (acc, v) -> cast(acc + v as decimal(25,12)))").as("composed"))
    assert(d.filter(col("native") =!= col("composed") ||
      col("native").isNull =!= col("composed").isNull).count() == 0)
  }

  test("dot_dec null semantics match zip_with padding: mismatched lengths and null slots") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),          // equal: 3 + 8 = 11
      (Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))       // mismatched: null
    ).toDF("a", "b")
      .select(call_function("dot_dec", col("a"), col("b")).as("d"))
      .collect()
    assert(df(0).getDecimal(0).doubleValue() == 11.0)
    assert(df(1).isNullAt(0))
  }

  test("dot_dec overflow semantics match the non-ANSI composable fold: null, never throw") {
    import spark.implicits._
    val df = Seq(
      (Seq(1e200, 1.0), Seq(1e200, 1.0)),   // product overflows double -> Infinity
      (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)), // NaN product
      (Seq(1e10, 1.0), Seq(1e10, 1.0)),      // product 1e20 > decimal(25,12) max
      (Seq(9e12, 9e12), Seq(1.0, 1.0)),      // each product fits; the SUM (1.8e13) overflows
      (Seq(9e12, 9e12, -9e12), Seq(1.0, 1.0, 1.0)) // sum overflows mid-fold, later element would recover — still null
    ).toDF("a", "b")
    // dot_dec pins the NON-ANSI cast semantics (null on overflow) regardless
    // of the session's ansi.enabled — compare under the matching mode (under
    // ANSI the composable fold throws instead, which is the one divergence).
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val out = df.select(
        call_function("dot_dec", col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> cast(x * y as decimal(25,12)))," +
          " cast(0 as decimal(25,12)), (acc, v) -> cast(acc + v as decimal(25,12)))").as("composed"))
        .collect()
      out.zipWithIndex.foreach { case (r, i) =>
        assert(r.isNullAt(0), s"row $i: native should be null, got ${r.get(0)}")
        assert(r.isNullAt(1), s"row $i: composable form disagrees — got ${r.get(1)}")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("minhash_bands equals the exploded groupBy-min formulation band for band") {
    import graft.functions.MinhashParams._
    val d = Tables.load(spark, Sf, "documents")
      .withColumn("w", split(lower(trim(col("text"))), " "))
      .filter(size(col("w")) >= 3)
    // native row-local path
    val native = d.select(col("doc_id"),
      posexplode(call_function("minhash_bands",
        expr("transform(sequence(0, size(w) - 3), i -> md5_long60(concat_ws(' ', w[i], w[i+1], w[i+2])))")))
        .as(Seq("band_idx", "band_hash")))
    // exploded reference: explode shingles, groupBy 32 mins, concat bands
    val exploded = d.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(w) - 3), i -> md5_long60(concat_ws(' ', w[i], w[i+1], w[i+2])))")).as("sh"))
      .groupBy("doc_id")
      .agg(min((col("sh") % P * perms(0)._1 + perms(0)._2) % P).as("m0"),
        (1 until NumPerms).map { i =>
          min((col("sh") % P * perms(i)._1 + perms(i)._2) % P).as(s"m$i")
        }: _*)
    val refBands = exploded.select(col("doc_id"),
      posexplode(array((0 until Bands).map { b =>
        concat_ws(":", (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")): _*)
      }: _*)).as(Seq("band_idx", "band_hash")))
    assert(native.count() == refBands.count())
    assert(native.exceptAll(refBands).count() == 0 &&
      refBands.exceptAll(native).count() == 0,
      "native and exploded band tables must be identical multisets")
  }

  test("collect_set_capped equals sort_array(collect_set) + size filter bit-for-bit") {
    // q23's posting-list bound: the capped aggregate must emit exactly the
    // rows the unbounded-buffer filter formulation emits. Cap 5 on the
    // real shingle stream exercises both branches (kept lists and
    // over-cap NULLs) heavily.
    val raw = graft.operators.Dedup.rawShingles(Tables.load(spark, Sf, "documents"))
    val capped = raw.groupBy("sh")
      .agg(call_function("collect_set_capped", col("doc_id"), lit(5)).as("ids"))
      .filter(col("ids").isNotNull)
    val ref = raw.groupBy("sh")
      .agg(sort_array(collect_set("doc_id")).as("ids"))
      .filter(size(col("ids")) <= 5)
    assert(capped.count() == ref.count())
    assert(capped.exceptAll(ref).count() == 0 && ref.exceptAll(capped).count() == 0,
      "capped and filter formulations must produce identical posting lists")
  }

  test("collect_set_capped buffer storage never exceeds the cap under a viral key") {
    import graft.functions.CappedLongSet
    val b = new CappedLongSet(50)
    (0 until 100000).foreach { i =>
      b.add(i.toLong)
      assert(b.set.size <= 50, s"buffer grew to ${b.set.size} at insert $i")
    }
    assert(b.overflow && b.set.isEmpty, "viral key must spill to the empty overflow state")
    // a complete partial merges exactly; an overflowed partial poisons
    val c = new CappedLongSet(50)
    (0L until 10L).foreach(c.add)
    val d = new CappedLongSet(50)
    (5L until 20L).foreach(d.add)
    c.mergeIn(d)
    assert(!c.overflow && c.set.size == 20)
    c.mergeIn(b)
    assert(c.overflow && c.set.isEmpty)
  }

  test("collect_set_capped is registered on the SQL surface and ignores nulls") {
    import spark.implicits._
    Seq(Some(3L), Some(1L), None, Some(2L), Some(1L)).toDF("v")
      .createOrReplaceTempView("csc_fn_test")
    val kept = spark.sql("SELECT collect_set_capped(v, 3) AS ids FROM csc_fn_test")
      .first().getSeq[Long](0)
    assert(kept == Seq(1L, 2L, 3L), s"sorted distinct expected, got $kept")
    val dropped = spark.sql("SELECT collect_set_capped(v, 2) AS ids FROM csc_fn_test")
      .first()
    assert(dropped.isNullAt(0), "over-cap group must evaluate to NULL")
  }

  test("dot_dec stays inside whole-stage codegen") {
    val p = planString(Tables.load(spark, Sf, "embeddings")
      .withColumn("emb", expr("transform(embedding, x -> cast(x as double))"))
      .select(call_function("dot_dec", col("emb"), col("emb"))))
    assert("""\*\(\d+\) Project \[.*dot_dec""".r.findFirstIn(p).isDefined, p.take(400))
  }
}
