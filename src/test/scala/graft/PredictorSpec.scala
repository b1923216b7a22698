package graft

import graft.ml.Predictor
import graft.operators.Windows
import org.apache.spark.sql.functions._

/** Trained-model pipeline: fit on the gold rollup, persist, reload,
  * re-score — the reference's train.py/predict.py contract (r² floor on
  * held-out rows; loaded artifact scores identically to the in-memory
  * one).
  */
class PredictorSpec extends SparkSpec {

  private lazy val feats =
    Predictor.features(Windows.q12DailyRollup(spark, Sf)).cache()

  test("fit reaches an r² floor on held-out users") {
    // sf0.01: the label's explainable variance is inherently bounded in
    // the synthetic data — per-day purchase count is almost always 1-3,
    // so between-count variance (the only linear signal) is ~0.16 of the
    // total, the rest being single-draw value noise (measured: in-sample
    // corr(purchases, purchase_total) = 0.40). The floor asserts the
    // model captured genuine held-out signal, not a high bar the data
    // cannot support.
    val rich = Predictor.features(
      Windows.q12DailyRollup(spark, "/root/testdata/sf0.01"))
    val train = rich.filter(col("user_id") % 5 =!= 0)
    val test = rich.filter(col("user_id") % 5 === 0)
    assert(train.count() > 500 && test.count() > 100)
    val model = Predictor.fit(train)
    val r2 = Predictor.r2(Predictor.score(model, test))
    assert(r2 > 0.05, s"held-out r² was $r2 — no generalizing signal captured")
  }

  test("run tracking logs candidates and selects the best by metric") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tracking").toString + "/runs"
    Predictor.logRun(spark, dir, "candidate_ridge",
      Map("model_type" -> "ridge", "n_features" -> "5"),
      Map("cv_mae" -> 4.2, "cv_r2" -> 0.61), "2024-01-10")
    Predictor.logRun(spark, dir, "candidate_ols",
      Map("model_type" -> "ols", "n_features" -> "5"),
      Map("cv_mae" -> 3.8, "cv_r2" -> 0.58), "2024-01-10")
    Predictor.logRun(spark, dir, "naive_baseline",
      Map("model_type" -> "NaiveBaseline_7d_avg"),
      Map("cv_mae" -> 6.0), "2024-01-10")
    assert(Predictor.listRuns(spark, dir).count() == 3)
    val bestLoss = Predictor.bestRun(spark, dir, "cv_mae").head()
    assert(bestLoss.getAs[String]("run_name") == "candidate_ols")
    val bestScore = Predictor.bestRun(spark, dir, "cv_r2", minimize = false).head()
    assert(bestScore.getAs[String]("run_name") == "candidate_ridge")
    // a run without the metric never wins that metric's selection
    assert(Predictor.bestRun(spark, dir, "cv_r2", minimize = true)
      .head().getAs[String]("run_name") != "naive_baseline")
  }

  test("save/load round-trip scores identically") {
    val model = Predictor.fit(feats)
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    Predictor.save(model, dir)
    val reloaded = Predictor.load(dir)
    val a = Predictor.score(model, feats).orderBy("user_id", "day")
      .select("prediction").collect().map(_.getDouble(0))
    val b = Predictor.score(reloaded, feats).orderBy("user_id", "day")
      .select("prediction").collect().map(_.getDouble(0))
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, "loaded model diverged") }
  }
}
