package graft

import graft.operators.Experiments
import org.apache.spark.sql.functions._

class ExperimentsSpec extends SparkSpec {

  private lazy val q76 = Experiments.q76BayesianEffect(spark, Sf).collect()
  private lazy val q77 = Experiments.q77DidCounterfactual(spark, Sf).collect()
  private lazy val q78 = Experiments.q78CorrelationPanel(spark, Sf).collect()

  test("Num.phi matches the standard normal CDF within the A&S error bound") {
    // reference values from the exact CDF (scipy.stats.norm.cdf)
    val expected = Seq(0.0 -> 0.5, 1.0 -> 0.8413447461, -1.0 -> 0.1586552539,
      1.96 -> 0.9750021049, -2.5 -> 0.0062096653, 3.0 -> 0.9986501020)
    val df = spark.createDataFrame(expected.map { case (x, _) => Tuple1(x) })
      .toDF("x").select(col("x"), Num.phi(col("x")).as("p"))
    val got = df.collect().map(r => r.getAs[Double]("x") -> r.getAs[Double]("p")).toMap
    expected.foreach { case (x, want) =>
      assert(math.abs(got(x) - want) < 2e-7, s"phi($x) = ${got(x)}, want ~$want")
    }
  }

  test("q76: posterior effect always lies between zero-shift and the raw pre→post delta") {
    // The conjugate posterior mean is a precision-weighted average of the
    // prior (pre) mean and the post sample mean, so the effect must have
    // the same sign as, and be no larger in magnitude than, the raw delta.
    assert(q76.nonEmpty)
    q76.foreach { r =>
      val delta = r.getAs[Double]("post_mean") - r.getAs[Double]("pre_mean")
      val eff = r.getAs[Double]("effect")
      assert(math.abs(eff) <= math.abs(delta) + 0.02, s"effect $eff vs raw delta $delta")
      if (math.abs(delta) > 0.05) assert(eff.sign == delta.sign || eff == 0.0)
    }
  }

  test("q76: probability and credible interval are mutually consistent") {
    q76.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("ci_low"), r.getAs[Double]("ci_high"))
      val p = r.getAs[Double]("prob_positive")
      assert(lo <= hi)
      assert(p >= 0.0 && p <= 1.0)
      // 95% CI entirely positive → P(effect>0) must exceed 97%; and vice versa
      if (lo > 0) assert(p > 0.97)
      if (hi < 0) assert(p < 0.03)
    }
  }

  test("q76: verdict CASE replays the analyzer's thresholds on the reported row") {
    q76.foreach { r =>
      val d = r.getAs[Double]("cohens_d")
      val (lo, hi) = (r.getAs[Double]("ci_low"), r.getAs[Double]("ci_high"))
      val want =
        if (math.abs(d) < 0.2) "Negligible effect"
        else if (lo > 0) { if (d > 0.5) "Likely positive effect" else "Small positive effect" }
        else if (hi < 0) { if (d < -0.5) "Likely negative effect" else "Small negative effect" }
        else "Inconclusive: effect crosses zero"
      assert(r.getAs[String]("verdict") == want)
    }
  }

  test("q77: counterfactual equals the pre-trend extrapolation and DiD is its residual") {
    assert(q77.nonEmpty)
    q77.foreach { r =>
      val did = r.getAs[Double]("did_effect")
      val actual = r.getAs[Double]("actual_post_mean")
      val cf = r.getAs[Double]("counterfactual_post_mean")
      if (r.getAs[Long]("n_pre") >= 3)
        assert(math.abs(did - (actual - cf)) < 0.02, s"did $did vs $actual - $cf")
      else {
        assert(did == 0.0 && r.getAs[Double]("pre_trend_slope") == 0.0)
        assert(r.getAs[String]("warning").startsWith("Too few pre-period"))
      }
    }
  }

  test("q77: parallel-trends flag matches r-squared > 0.3 and drives the warning") {
    q77.filter(_.getAs[Long]("n_pre") >= 3).foreach { r =>
      val valid = r.getAs[Int]("parallel_trends_valid") == 1
      assert(valid == (r.getAs[Double]("pre_trend_r2") > 0.3))
      if (!valid) assert(r.getAs[String]("warning").contains("non-linear"))
      else assert(r.getAs[String]("warning") == null)
    }
  }

  test("q78: r, r-squared, t and significance are internally consistent") {
    assert(q78.nonEmpty)
    q78.foreach { r =>
      val rr = r.getAs[Double]("r")
      assert(rr >= -1.0001 && rr <= 1.0001)
      assert(math.abs(r.getAs[Double]("r_squared") - rr * rr) < 2e-3)
      val t = r.getAs[Double]("t_stat")
      assert(t.sign == rr.sign || rr == 0.0)
      val p = r.getAs[Double]("p_value_z")
      assert((r.getAs[Int]("significant") == 1) == (p < 0.05))
      val strength = r.getAs[String]("strength")
      val want = math.abs(rr) match {
        case a if a < 0.1 => "negligible"
        case a if a < 0.3 => "weak"
        case a if a < 0.5 => "moderate"
        case a if a < 0.7 => "strong"
        case _ => "very strong"
      }
      assert(strength == want)
    }
  }

  test("q78: hand-computed Pearson r for one entity matches") {
    // recompute r for the first entity from the same pairs definition
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    val pairs = graft.operators.Windows.q12DailyRollup(spark, Sf)
      .withColumn("y", lead("view_score", 1).over(w))
      .filter(col("purchase_total").isNotNull && col("y").isNotNull)
      .select(col("user_id"), col("purchase_total").as("x"), col("y"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    q78.take(5).foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val xs = pairs(uid).map(_.getAs[Double]("x"))
      val ys = pairs(uid).map(_.getAs[Double]("y"))
      val n = xs.length.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val r0 = cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum * ys.map(b => (b - my) * (b - my)).sum)
      assert(math.abs(r.getAs[Double]("r") - r0) < 1e-3, s"user $uid: ${r.getAs[Double]("r")} vs $r0")
    }
  }

  test("tracker → analyzer: store-persisted interventions drive the Bayesian battery") {
    import graft.sources.ExperimentStore
    import graft.operators.{Alerts, Experiments}
    val dir = java.nio.file.Files.createTempDirectory("expstore-intg").toString
    // persist the same intervention the literal config carries, then run
    // the analyzer from the STORE's frame — the reference's tracker.py →
    // analyzer.py flow
    ExperimentStore.addIntervention(spark, dir, ExperimentStore.Intervention(
      "i1", "Creatine Loading", "supplement", "", "2024-01-15", Some("2024-01-25"), 3, "", "t0"))
    val fromStore = ExperimentStore.listInterventions(spark, dir)
      .withColumn("metric", lit("purchase"))
    val daily = Alerts.dailyMetrics(graft.Tables.load(spark, Sf, "events"))
    val got = Experiments.bayesianFor(Experiments.taggedObsFor(daily, fromStore)).collect()
    val want = q76.filter(_.getAs[String]("id") == "i1")
    assert(got.length == want.length && got.nonEmpty)
    val gotEff = got.map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("effect")).toMap
    want.foreach { r =>
      assert(gotEff(r.getAs[Long]("user_id")) == r.getAs[Double]("effect"))
    }
  }

  test("q88: hand-computed Mann-Whitney U, tie-corrected z, and p match") {
    import spark.implicits._
    // Cohort a: 1,2,3,4,5; cohort b: 3,4,5,6,7 (n1 = n2 = 5, name-asc
    // tie-break makes a the g1 side). Pooled midranks:
    // 1,2,3.5,3.5,5.5,5.5,7.5,7.5,9,10 → R1 = 19.5 → U1 = 4.5.
    // Ties: three groups of 2 → Σ(t³−t) = 18; σ² = (25/12)(11 − 18/90)
    // = 22.5; z = (4.5 − 12.5 + 0.5)/√22.5 = −1.5811 (continuity
    // correction toward the mean); p = 2(1 − Φ(|z|)) ≈ 0.1139 — the
    // values scipy.stats.mannwhitneyu(method='asymptotic') reports.
    val obs =
      (Seq(1, 2, 3, 4, 5).map(v => (1L, "a", v.toDouble)) ++
        Seq(3, 4, 5, 6, 7).map(v => (1L, "b", v.toDouble)) ++
        // user 2: second cohort below the n≥5 floor → no test row
        Seq(1, 2, 3, 4, 5).map(v => (2L, "a", v.toDouble)) ++
        Seq(1, 2).map(v => (2L, "b", v.toDouble)) ++
        // user 3: every pooled outcome tied → σ = 0 → filtered
        Seq.fill(5)((3L, "a", 9.0)) ++ Seq.fill(5)((3L, "b", 9.0)))
        .toDF("user_id", "category", "outcome")
    val rows = graft.operators.Predictive.mannWhitneyPanel(obs).collect()
    assert(rows.length == 1, s"only user 1 qualifies, got ${rows.length}")
    val r = rows.head
    assert(r.getAs[String]("g1") == "a" && r.getAs[String]("g2") == "b")
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 5L)
    assert(r.getAs[Double]("u_stat") == 4.5)
    assert(math.abs(r.getAs[Double]("z_stat") - -1.5811) < 1e-4)
    assert(math.abs(r.getAs[Double]("p_value") - 0.1139) < 2e-4)
    assert(r.getAs[Int]("significant") == 0)
    assert(r.getAs[Double]("mean1") == 3.0 && r.getAs[Double]("mean2") == 5.0)
    assert(r.getAs[Double]("median1") == 3.0 && r.getAs[Double]("median2") == 5.0)
  }

  test("q88: the panel runs on entity-partitioned windows with no join") {
    val p = graft.operators.Predictive.q88MannWhitney(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(user_id"), p.take(400))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "cohort selection and ranks must be windows, not joins")
  }

  test("q76/q77 plans broadcast the interventions config; no SortMergeJoin") {
    Seq(Experiments.q76BayesianEffect(spark, Sf), Experiments.q77DidCounterfactual(spark, Sf))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
        assert(!plan.contains("SortMergeJoin"), "config-sized joins must broadcast")
      }
  }
}
