package graft

import graft.operators.{Profile, Temporal}
import org.apache.spark.sql.functions._

/** Value assertions for the profiler and the batch temporal operators
  * beyond their DuckDB oracles: the HLL profile's error envelope, and
  * the session/as-of invariants recomputed from raw events.
  */
class ProfileTemporalSpec extends SparkSpec {

  test("q133 retention: offset 0 is 100%, cohorts partition the user base, bounds hold") {
    val rows = Temporal.q133Retention(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[String]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      // by definition every cohort member is active in their first week
      val zero = rs.find(_.getAs[Int]("week_offset") == 0).get
      assert(zero.getAs[Long]("n_active") == zero.getAs[Long]("cohort_size"), cw)
      assert(zero.getAs[Double]("retention_pct") == 100.0, cw)
      rs.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"), cw)
        assert(r.getAs[Int]("week_offset") >= 0, cw)
      }
      // one size per cohort, everywhere
      assert(rs.map(_.getAs[Long]("cohort_size")).distinct.length == 1, cw)
    }
    // cohorts PARTITION the user base: sizes sum to the distinct users
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    val sizeSum = byCohort.values
      .map(_.head.getAs[Long]("cohort_size")).sum
    assert(sizeSum == users, s"$sizeSum vs $users")
  }

  test("q132 PSI equals an independent recomputation and flags by the rubric") {
    import graft.operators.TextOps
    val rows = Profile.q132SourcePsi(spark, Sf).collect()
    assert(rows.nonEmpty)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val scored = TextOps.stats(spark.read.parquet(s"$Sf/documents.parquet"))
      .select(col("source"),
        least(floor(col("quality_score") * 10).cast("int"), lit(9)).as("bin"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val gTotal = scored.length.toDouble
    val gBin = scored.groupBy(_._2).map { case (b, xs) => b -> xs.length }
      .withDefaultValue(0)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = scored.filter(_._1 == src)
      assert(r.getAs[Long]("n_docs") == mine.length.toLong, src)
      val psi = (0 to 9).map { b =>
        val p = math.max(r6(mine.count(_._2 == b) / mine.length.toDouble), 1e-4)
        val g = math.max(r6(gBin(b) / gTotal), 1e-4)
        r6((p - g) * r6(math.log(p / g)))
      }.sum
      val got = r.getAs[Double]("psi_r")
      assert(math.abs(r6(psi) - got) < 1e-9, s"$src: $psi vs $got")
      val flag = if (got >= 0.25) "shift" else if (got >= 0.1) "watch" else "ok"
      assert(flag == r.getAs[String]("drift_flag"), src)
      // PSI is a sum of same-sign terms: never meaningfully negative
      assert(got >= -1e-5, src)
    }
  }

  test("approx profile stays inside the HLL error envelope of the exact profile") {
    val exact = Profile.q55ColumnProfile(spark, Sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    val approx = Profile.profileApprox(spark, Sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct_approx")).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, nd) =>
      val est = approx(c)
      // rsd 0.02 → allow 3 sigma plus small-cardinality slack
      val tol = math.max(3, nd * 0.06)
      assert(math.abs(est - nd) <= tol, s"$c: exact $nd, approx $est")
    }
  }

  test("q56 sessions partition each user's events at exactly the 30-minute gap") {
    val sessions = Temporal.q56SessionizeBatch(spark, Sf).collect()
    val gapUs = 30L * 60 * 1000000
    // session end = last event + gap; windows of one user never overlap
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_start_us"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("session_end_us") <= b.getAs[Long]("session_start_us"),
            "overlapping sessions")
        case _ =>
      }
    }
    // event counts conserve: every event lands in exactly one session
    val total = sessions.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.load(spark, Sf, "events").count())
    // at least one multi-event session exists at this density
    assert(sessions.exists(_.getAs[Long]("n_events") > 1))
  }

  test("q57 as-of lookup is never from the future and matches a recomputed probe") {
    val out = Temporal.q57AsofJoin(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("view_ts_us")))
        assert(r.getAs[Long]("view_ts_us") <= r.getAs[Long]("ts_us"),
          s"future lookup on event ${r.getAs[Long]("event_id")}")
    }
    // spot-check one purchase against a directly computed answer
    val e = Tables.load(spark, Sf, "events")
    val probe = out.filter(!_.isNullAt(4)).maxBy(_.getAs[Long]("ts_us"))
    val (uid, ts) = (probe.getAs[Long]("user_id"), probe.getAs[Long]("ts_us"))
    val expected = e.filter(col("event_type") === "view" &&
        col("user_id") === uid && expr("unix_micros(ts)") <= ts)
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    assert(probe.getAs[Long]("view_ts_us") == expected)
  }
}
