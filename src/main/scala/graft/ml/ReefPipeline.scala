package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{Normalizer, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's entire semantic surface (reef-fish survey →
  * per-survey relative-abundance vectors → lat/long regression),
  * re-expressed as one declarative DataFrame pipeline + MLlib
  * `Pipeline` (SURVEY.md §7.1 "Slice 0").
  *
  * Reference mapping (cited file:line are in /root/reference):
  *  - CSV ingest incl. quoted-comma handling: Data_transform.py:32-76
  *    (arreglaComas + manual split) → one `spark.read.csv` with
  *    quote/escape options; unlike the reference we preserve the
  *    original comma instead of rewriting it to ';'.
  *  - count vectorization: Data_transform.py:87-100 (groupByKey +
  *    driver closure, full value shuffle) → groupBy().pivot(vocab)
  *    .sum() — hash aggregation with map-side partial aggregation;
  *    the explicit vocab list preserves the reference's fixed 189-slot
  *    layout AND its silent drop of families outside the vocabulary
  *    (Data_transform.py:90-91).
  *  - L1 normalization with zero-total guard: Data_transform.py:92-95 →
  *    ml.feature.Normalizer(p=1), which leaves zero vectors unchanged.
  *  - latitude appended to features: Data_transform.py:117. This is
  *    label leakage for the latitude model; the reference does it, so
  *    capability parity keeps it — `includeLatInFeatures = false` is
  *    the honest variant.
  *  - RF/GBT + RMSE: Data_transform.py:155-179, with the split SEEDED
  *    (the reference's unseeded split makes its RMSEs unreproducible —
  *    SURVEY.md §5.1).
  *
  * Scale notes: the pivot produces |vocab| partial-agg columns — at
  * 100 TB the (SurveyID, lat, long) grouping shuffles only
  * |vocab|-width partial sums per group, not the raw observations;
  * the vocabulary rides the plan as literals (broadcast-sized, 189
  * entries). See [[FamilyCountAggregator]] for the typed single-column
  * alternative with identical semantics.
  */
object ReefPipeline {

  /** Raw CSV → the 5 consumed columns, typed. */
  def ingest(spark: SparkSession, csvPath: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(csvPath)
      .select(
        col("SurveyID"),
        col("SiteLat").cast("double").as("latitude"),
        col("SiteLong").cast("double").as("longitude"),
        col("Family"),
        col("Total").cast("double").as("Total"))

  /** Per-survey family-count columns in fixed vocabulary order.
    * Families outside `vocab` are dropped (reference parity). */
  def countVectors(typed: DataFrame, vocab: Seq[String]): DataFrame =
    typed
      .groupBy(col("SurveyID"), col("latitude"), col("longitude"))
      .pivot("Family", vocab)
      .sum("Total")
      .na.fill(0.0, vocab)

  /** Feature pipeline: assemble counts → L1-normalize → append latitude
    * (unless includeLatInFeatures=false). */
  def featurePipeline(vocab: Seq[String],
      includeLatInFeatures: Boolean = true): Pipeline = {
    val famAssembler = new VectorAssembler()
      .setInputCols(vocab.toArray).setOutputCol("famCounts")
    val normalizer = new Normalizer()
      .setInputCol("famCounts").setOutputCol("famShares").setP(1.0)
    val finalCols =
      if (includeLatInFeatures) Array("famShares", "latitude")
      else Array("famShares")
    val finalAssembler = new VectorAssembler()
      .setInputCols(finalCols).setOutputCol("features")
    new Pipeline().setStages(Array(famAssembler, normalizer, finalAssembler))
  }

  /** End-to-end featurization: csv → (latitude, longitude, features). */
  def featurize(spark: SparkSession, csvPath: String, vocab: Seq[String],
      includeLatInFeatures: Boolean = true): DataFrame = {
    val vectors = countVectors(ingest(spark, csvPath), vocab)
    featurePipeline(vocab, includeLatInFeatures)
      .fit(vectors).transform(vectors)
      .select(col("latitude"), col("longitude"), col("features"))
  }

  sealed trait ModelKind
  case object RF extends ModelKind
  case object GBT extends ModelKind

  /** Seeded 70/30 split, fit, RMSE on the held-out 30% —
    * Data_transform.py:155-179 with reproducibility fixed. */
  def trainAndEvaluate(featured: DataFrame, labelCol: String,
      kind: ModelKind, seed: Long = 42L): (PipelineModel, Double) = {
    val Array(train, test) = featured.randomSplit(Array(0.7, 0.3), seed)
    val regressor = kind match {
      case RF => new RandomForestRegressor()
        .setFeaturesCol("features").setLabelCol(labelCol).setSeed(seed)
      case GBT => new GBTRegressor()
        .setFeaturesCol("features").setLabelCol(labelCol).setSeed(seed)
    }
    val model = new Pipeline().setStages(Array(regressor)).fit(train)
    val predictions = model.transform(test)
    val rmse = new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName("rmse")
      .evaluate(predictions)
    (model, rmse)
  }

  /** Seeded k-fold model selection — the `CrossValidator` surface the
    * MLlib north star implies (Pipeline + param grid + evaluator; the
    * reference imports Pipeline and never tunes, Data_transform.py:9).
    * Fold assignment and tree seeds are all fixed, so the selected
    * maxDepth and per-candidate mean RMSEs are run-to-run
    * reproducible. `parallelism(2)` fits grid candidates concurrently
    * — on a cluster each fit is itself distributed, so the two knobs
    * compose. Returns (best mean RMSE, best maxDepth, all mean RMSEs
    * in grid order). */
  def crossValidate(featured: DataFrame, labelCol: String,
      seed: Long = 42L): (Double, Int, Array[Double]) = {
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol(labelCol).setSeed(seed)
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(3, 5))
      .build()
    val cv = new CrossValidator()
      .setEstimator(new Pipeline().setStages(Array(rf)))
      .setEvaluator(new RegressionEvaluator()
        .setLabelCol(labelCol).setPredictionCol("prediction")
        .setMetricName("rmse"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setSeed(seed)
      .setParallelism(2)
    val m = cv.fit(featured)
    val bestDepth = m.bestModel.asInstanceOf[PipelineModel]
      .stages(0).asInstanceOf[RandomForestRegressionModel].getMaxDepth
    (m.avgMetrics.min, bestDepth, m.avgMetrics)
  }
}
