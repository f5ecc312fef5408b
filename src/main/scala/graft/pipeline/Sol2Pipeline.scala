package graft.pipeline

import graft.model.{MacroF1Evaluator, Models}
import graft.split.Splits
import graft.transform.{Features, LabelEncoder}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's second entry point (Sol_2.ipynb, SURVEY §3 §2):
  * notebook feature block (12 derived features incl. the labeled age
  * category), categorical encoding with unseen -> -1, stratified split,
  * three MLlib models with balanced class weights compared by macro-F1,
  * and a small CV grid search on the best-performing family.
  */
object Sol2Pipeline {

  final case class Config(
      categoricals: Seq[String] =
        Seq("country", "property_type", "furnishing_status",
          "property_age_category"),
      referenceYear: Int = 2025, // Sol_2.ipynb's constant (house_predict_model.ipynb uses 2024)
      splitFrac: Double = 0.8,
      seed: Long = 42,
      cvFolds: Int = 3,
      // ensemble budgets: defaults mirror the notebook-scale settings;
      // callers that only check pipeline shape + determinism (the driver
      // gate) dial these down — the comparison/CV STRUCTURE (Sol_2.ipynb
      // cells 7-13) is independent of the per-model iteration counts
      rfNumTrees: Int = 10,
      gbtMaxIter: Int = 10)

  final case class Result(
      report: DataFrame,      // (model, accuracy, macro_f1) best-first
      bestModel: String,
      cvBestMacroF1: Double,
      featureCols: Seq[String])

  def run(train: DataFrame, cfg: Config = Config()): Result = {
    var df = Features.derive(train, Features.houseNotebookBlock(cfg.referenceYear))
    val featureCols = Seq.newBuilder[String]
    cfg.categoricals.foreach { c =>
      df = LabelEncoder.fit(df, c).transform(df, s"${c}_encoded")
      featureCols += s"${c}_encoded"
    }
    featureCols ++= Seq(
      "property_size_sqft", "price", "rooms", "bathrooms",
      "customer_salary", "loan_amount", "monthly_expenses", "down_payment",
      "emi_to_income_ratio", "satisfaction_score", "neighbourhood_rating",
      "connectivity_score",
      // notebook derived numerics
      "affordability_ratio", "loan_to_value", "property_age",
      "payment_capacity", "down_payment_ratio", "risk_score",
      "quality_score", "price_to_salary_ratio", "loan_to_price_ratio",
      "affordability_score", "price_per_sqft", "rooms_per_sqft",
      "expense_ratio", "loan_tenure_risk", "property_quality_score",
      "total_risk_score")
    val feats = featureCols.result()

    val split = Splits.stratifiedSplit(df, "label", cfg.splitFrac, cfg.seed)
      .persist()
    val fitSet = split.filter(col("split") === 0)
    val valSet = split.filter(col("split") === 1)

    val report = Models.comparisonReport(fitSet, valSet, "label", Seq(
      // the notebook's model 1 is L1-regularized (Sol_2.ipynb cell 7:
      // penalty='l1', C from LogisticRegressionCV); a fixed small L1
      // stands in for the CV-chosen C — and bounds the coefficients, so
      // the solver converges instead of chasing a separating hyperplane
      // to infinity on cleanly separable data
      "logreg" -> Models.logReg(feats, "label", regParam = 0.01,
        elasticNet = 1.0, maxIter = 10),
      "random_forest" -> Models.randomForest(feats, "label",
        numTrees = cfg.rfNumTrees, maxDepth = 5, seed = cfg.seed),
      "gbt" -> Models.gbt(feats, "label", maxIter = cfg.gbtMaxIter,
        maxDepth = 3, seed = cfg.seed)))
    val best = report.head().getString(0)

    // cell-9-style small grid on the RF family scored by macro-F1
    val rfPipeline = Models.randomForest(feats, "label",
      numTrees = cfg.rfNumTrees, maxDepth = 5, seed = cfg.seed)
    val rf = rfPipeline.getStages.last.asInstanceOf[RandomForestClassifier]
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(3, 5))
      .build()
    val cv = Models.crossValidate(fitSet, "label", rfPipeline, grid,
      numFolds = cfg.cvFolds, seed = cfg.seed)
    val cvScored = cv.transform(valSet)
      .selectExpr("CAST(label AS LONG) AS label",
        "CAST(prediction AS LONG) AS pred")
    val cvF1 = new MacroF1Evaluator().setLabelCol("label")
      .setPredictionCol("pred").evaluate(cvScored)
    split.unpersist()
    Result(report, best, cvF1, feats)
  }
}
