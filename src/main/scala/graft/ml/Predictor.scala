package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The trained-model pipeline: feature assembly from the gold rollup →
  * fitted regression → persisted artifact → batch scoring
  * (reference: models/readiness_predictor/train.py — sklearn Pipeline of
  * imputer/scaler/regressor fitted on the gold feature table, persisted
  * with joblib, metrics to JSON; predict.py — load artifact, score the
  * feature frame). Spark MLlib's Pipeline/PipelineModel is the
  * public-knowledge analog: the same assemble→scale→regress stages, with
  * save/load to a directory instead of joblib.
  *
  * The closed-form (single-feature) twin of this model is registered as
  * oracle-checked q42 ([[graft.operators.Predictive.q42PredictScore]]);
  * this module carries the multi-feature trained path, verified by
  * PredictorSpec (save/load/score round-trip + an r² floor on held-out
  * rows).
  *
  * Scale: fitting LinearRegression is one pass of distributed gradient /
  * normal-equation solving over the assembled vectors (MLlib handles the
  * aggregation tree); scoring is a row-local transform — no shuffle at
  * all. The feature frame is the q12 rollup, already one scan + one
  * shuffle.
  */
object Predictor {

  val FeatureCols: Seq[String] =
    Seq("views", "view_score_filled", "clicks", "errors", "purchases")

  /** Feature frame from the gold rollup: numeric predictors (null counts →
    * 0, the reference's SimpleImputer step as a deterministic fill) and
    * the day's spend as the label (train.py TARGET_COL analog).
    */
  def features(rollup: DataFrame): DataFrame =
    rollup
      .filter(col("purchase_total").isNotNull)
      .select(
        col("user_id"), col("day"),
        coalesce(col("views"), lit(0L)).cast("double").as("views"),
        coalesce(col("view_score_filled"), lit(0.0)).as("view_score_filled"),
        coalesce(col("clicks"), lit(0L)).cast("double").as("clicks"),
        coalesce(col("errors"), lit(0L)).cast("double").as("errors"),
        coalesce(col("purchases"), lit(0L)).cast("double").as("purchases"),
        col("purchase_total").as("label"))

  /** Assemble → scale → regress, the reference's sklearn stage list
    * (train.py _get_model_catalog Ridge path: StandardScaler + regularized
    * linear model). elasticNetParam 0 + regParam 0.1 ≈ Ridge(alpha).
    */
  def pipeline(): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols.toArray).setOutputCol("raw_features")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val lr = new LinearRegression()
      .setFeaturesCol("features").setLabelCol("label")
      .setPredictionCol("prediction")
      .setRegParam(0.1).setElasticNetParam(0.0)
    new Pipeline().setStages(Array(assembler, scaler, lr))
  }

  def fit(featureFrame: DataFrame): PipelineModel =
    pipeline().fit(featureFrame)

  /** Persist the fitted artifact (train.py joblib.dump analog). */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a persisted artifact (predict.py joblib.load analog). */
  def load(path: String): PipelineModel = PipelineModel.load(path)

  /** Batch-score a feature frame: prediction + residual per row
    * (predict.py output shape).
    */
  def score(model: PipelineModel, featureFrame: DataFrame): DataFrame =
    model.transform(featureFrame)
      .select(col("user_id"), col("day"), col("label"),
        col("prediction"),
        (col("label") - col("prediction")).as("residual"))

  /** Training-run tracking — the reference's MLflow layer
    * (models/readiness_predictor/mlflow_config.py: local tracking with a
    * file backend; train.py:309-330: each candidate run logs its params
    * and CV metrics under a run name, the baseline included) on the same
    * file-backed pattern as the insight store: one parquet log, run
    * records appended, best-run selection by metric. `runDate` is an
    * argument, never the clock (repo determinism discipline), and the
    * model artifact path rides along as a param — which is all
    * mlflow.log_model amounts to for a file backend.
    */
  def logRun(spark: org.apache.spark.sql.SparkSession, trackingDir: String,
             runName: String, params: Map[String, String],
             metrics: Map[String, Double], runDate: String): Unit = {
    import spark.implicits._
    Seq((runName, runDate, params, metrics))
      .toDF("run_name", "run_date", "params", "metrics")
      .write.mode("append").parquet(trackingDir)
  }

  /** All logged runs, newest run_date first. */
  def listRuns(spark: org.apache.spark.sql.SparkSession, trackingDir: String): DataFrame =
    spark.read.parquet(trackingDir).orderBy(col("run_date").desc, col("run_name"))

  /** The best run by a metric (minimize for losses like cv_mae, maximize
    * for scores like cv_r2) — train.py's candidate-selection step over
    * the tracking log. Ties break on run name for determinism.
    */
  def bestRun(spark: org.apache.spark.sql.SparkSession, trackingDir: String,
              metric: String, minimize: Boolean = true): DataFrame = {
    val v = element_at(col("metrics"), metric)
    spark.read.parquet(trackingDir)
      .filter(v.isNotNull)
      .orderBy(if (minimize) v.asc else v.desc, col("run_name"))
      .limit(1)
  }

  /** r² of scored rows — the train.py r2_score metric, from exact sums. */
  def r2(scored: DataFrame): Double = {
    val row = scored.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("label")).as("sy"),
        sum(col("label") * col("label")).as("syy"),
        sum((col("label") - col("prediction")) *
          (col("label") - col("prediction"))).as("sse"))
      .head()
    val n = row.getAs[Double]("n")
    val sy = row.getAs[Double]("sy")
    val syy = row.getAs[Double]("syy")
    val sse = row.getAs[Double]("sse")
    val sst = syy - sy * sy / n
    if (sst == 0) 0.0 else 1.0 - sse / sst
  }
}
