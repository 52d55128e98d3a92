package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.DataFrame

/** The reference's 5-stage fare-prediction pipeline (sparkML.py:70-171),
  * 1:1 in native Scala Spark ML — StringIndexer → OneHotEncoder →
  * VectorAssembler → StandardScaler → RandomForestRegressor — plus the
  * three RegressionEvaluators and feature importances.
  *
  * Parameter parity (persisted metadata under savedModels/stages/):
  * handleInvalid="keep" on both the indexer and assembler, default
  * dropLast=true one-hot, scaler withStd=true/withMean=false, RF
  * numTrees=100 maxDepth=10, split 0.8/0.2 seed 42. The reference's
  * label-leak (the label is also an assembled feature, SURVEY.md §2.9)
  * is NOT reproduced: pass the label in `numericCols` explicitly if
  * parity with the published metrics matters more than hygiene.
  */
final case class FareConfig(
    labelCol: String,
    categoricalCol: String,
    numericCols: Seq[String],
    numTrees: Int = 100,
    maxDepth: Int = 10,
    seed: Long = 42L,
    // "auto" (= onethird for regression) is the reference default; "all"
    // makes small synthetic fixtures learnable with few features
    featureSubsetStrategy: String = "auto")

final case class FareMetrics(
    trainRmse: Double, trainMae: Double, trainR2: Double,
    testRmse: Double, testMae: Double, testR2: Double,
    importances: Seq[(String, Double)])

object FarePipeline {

  def build(cfg: FareConfig): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol(cfg.categoricalCol)
      .setOutputCol(s"${cfg.categoricalCol}_index")
      .setHandleInvalid("keep")
    val encoder = new OneHotEncoder()
      .setInputCol(s"${cfg.categoricalCol}_index")
      .setOutputCol(s"${cfg.categoricalCol}_encoded")
    val assembler = new VectorAssembler()
      .setInputCols((cfg.numericCols :+ s"${cfg.categoricalCol}_encoded").toArray)
      .setOutputCol("assembled_features")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("assembled_features")
      .setOutputCol("features")
    val rf = new RandomForestRegressor()
      .setLabelCol(cfg.labelCol)
      .setFeaturesCol("features")
      .setNumTrees(cfg.numTrees)
      .setMaxDepth(cfg.maxDepth)
      .setFeatureSubsetStrategy(cfg.featureSubsetStrategy)
      .setSeed(cfg.seed)
    new Pipeline().setStages(Array(indexer, encoder, assembler, scaler, rf))
  }

  private def evaluate(pred: DataFrame, label: String, metric: String): Double =
    new RegressionEvaluator()
      .setLabelCol(label).setPredictionCol("prediction")
      .setMetricName(metric)
      .evaluate(pred)

  /** Deterministic 0.8/0.2 split (P12), fit, evaluate train+test with the
    * reference's three metrics, extract sorted importances. */
  def fitEval(df: DataFrame, cfg: FareConfig): (PipelineModel, FareMetrics) = {
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), cfg.seed)
    val model = build(cfg).fit(train)
    val (pTrain, pTest) = (model.transform(train), model.transform(test))
    val rf = model.stages.last.asInstanceOf[RandomForestRegressionModel]
    val names = cfg.numericCols ++
      (0 until (rf.numFeatures - cfg.numericCols.size)).map(i => s"${cfg.categoricalCol}_$i")
    val imps = names.zip(rf.featureImportances.toArray).sortBy(-_._2)
    (model, FareMetrics(
      evaluate(pTrain, cfg.labelCol, "rmse"),
      evaluate(pTrain, cfg.labelCol, "mae"),
      evaluate(pTrain, cfg.labelCol, "r2"),
      evaluate(pTest, cfg.labelCol, "rmse"),
      evaluate(pTest, cfg.labelCol, "mae"),
      evaluate(pTest, cfg.labelCol, "r2"),
      imps))
  }
}
