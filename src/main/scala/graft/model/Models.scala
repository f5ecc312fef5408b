package graft.model

import graft.metrics.Metrics
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** MLlib-backed ensemble models (SURVEY §2.8 M7, M10-M12): RF / GBT /
  * LogReg with class-weight balancing, a macro-F1 Evaluator (MLlib's `f1`
  * is weighted — the reference's metric is macro, task_2.md:24), L1
  * feature selection, and a model-comparison report.
  */
class MacroF1Evaluator(override val uid: String) extends Evaluator {
  def this() = this(Identifiable.randomUID("macroF1"))
  var labelCol = "label"
  var predictionCol = "prediction"
  def setLabelCol(v: String): this.type = { labelCol = v; this }
  def setPredictionCol(v: String): this.type = { predictionCol = v; this }

  override def evaluate(dataset: Dataset[_]): Double =
    Metrics.macroAvg(
      dataset.toDF.select(
        col(labelCol).cast("long").as("label"),
        col(predictionCol).cast("long").as("pred")),
      "label", "pred")
      .head().getAs[Double]("macro_f1")

  override def isLargerBetter: Boolean = true
  override def copy(extra: ParamMap): MacroF1Evaluator =
    new MacroF1Evaluator(uid)
}

object Models {

  /** Inverse-class-frequency weights (sklearn class_weight='balanced'):
    * w(c) = n / (k * n_c). Pure column math, no collect of data rows.
    */
  def withBalancedWeights(df: DataFrame, labelCol: String): DataFrame = {
    val counts = df.groupBy(labelCol).agg(count(lit(1)).as("__n"))
    val k = counts.count()
    val n = df.count()
    df.join(broadcast(counts), Seq(labelCol))
      .withColumn("weight", lit(n.toDouble) / (lit(k.toDouble) * col("__n")))
      .drop("__n")
  }

  def assembler(features: Seq[String]): VectorAssembler =
    new VectorAssembler().setInputCols(features.toArray)
      .setOutputCol("features")

  def randomForest(
      features: Seq[String], labelCol: String, numTrees: Int = 20,
      maxDepth: Int = 5, seed: Long = 42): Pipeline = {
    val rf = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setWeightCol("weight")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
    new Pipeline().setStages(Array(assembler(features), rf))
  }

  def gbt(
      features: Seq[String], labelCol: String, maxIter: Int = 20,
      maxDepth: Int = 4, seed: Long = 42): Pipeline = {
    val g = new GBTClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setWeightCol("weight")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
    new Pipeline().setStages(Array(assembler(features), g))
  }

  def logReg(
      features: Seq[String], labelCol: String, regParam: Double = 0.0,
      elasticNet: Double = 0.0, maxIter: Int = 25): Pipeline = {
    val lr = new LogisticRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setWeightCol("weight").setMaxIter(maxIter)
      .setRegParam(regParam).setElasticNetParam(elasticNet)
    new Pipeline().setStages(Array(assembler(features), lr))
  }

  /** M7: L1-regularized LogReg feature selection — features with nonzero
    * coefficients survive (Sol_2.ipynb cell 7 SelectFromModel).
    */
  def l1FeatureSelection(
      df: DataFrame, features: Seq[String], labelCol: String,
      regParam: Double = 0.01): Seq[(String, Double)] = {
    val model = logReg(features, labelCol, regParam, elasticNet = 1.0)
      .fit(withBalancedWeights(df, labelCol))
    val lrm = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val coefs: Vector = lrm.coefficients
    features.zipWithIndex.map { case (f, i) => f -> coefs(i) }
      .filter { case (_, c) => math.abs(c) > 0 }
  }

  /** M11: k-fold cross-validated grid search scored by macro-F1
    * (GridSearchCV(cv=k, scoring='f1_macro'), Sol_2.ipynb cell 9).
    * Returns the fitted best model + its grid.
    */
  def crossValidate(
      df: DataFrame, labelCol: String, pipeline: Pipeline,
      grid: Array[ParamMap], numFolds: Int = 3, parallelism: Int = 4,
      seed: Long = 42): org.apache.spark.ml.tuning.CrossValidatorModel = {
    val ev = new MacroF1Evaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction")
    new org.apache.spark.ml.tuning.CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(ev)
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setParallelism(parallelism)
      .setSeed(seed)
      .fit(withBalancedWeights(df, labelCol))
  }

  /** M12: fit each named pipeline on train, evaluate on validation,
    * return a (model, accuracy, macro_f1) report sorted best-first.
    */
  def comparisonReport(
      train: DataFrame, valid: DataFrame, labelCol: String,
      pipelines: Seq[(String, Pipeline)]): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val trainW = withBalancedWeights(train, labelCol)
    val rows = pipelines.map { case (name, p) =>
      val m: PipelineModel = p.fit(trainW)
      val scored = m.transform(valid)
        .select(
          col(labelCol).cast("long").as("label"),
          col("prediction").cast("long").as("pred"))
      val acc = Metrics.accuracy(scored, "label", "pred").head().getDouble(0)
      val f1 = Metrics.macroAvg(scored, "label", "pred")
        .head().getAs[Double]("macro_f1")
      (name, acc, f1)
    }
    rows.toDF("model", "accuracy", "macro_f1")
      .orderBy(desc("macro_f1"), col("model"))
  }
}
