package graft.model

import graft.SparkTestSession
import graft.metrics.Metrics
import org.scalatest.funsuite.AnyFunSuite

class ModelsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("MacroF1Evaluator agrees with Metrics.macroAvg") {
    val df = Seq((0L, 0.0), (0L, 0.0), (0L, 0.0), (1L, 0.0))
      .toDF("label", "prediction")
    val ev = new MacroF1Evaluator().setLabelCol("label")
      .setPredictionCol("prediction")
    val viaMetrics = Metrics.macroAvg(
      df.selectExpr("label", "CAST(prediction AS LONG) AS pred"),
      "label", "pred").head().getAs[Double]("macro_f1")
    assert(ev.evaluate(df) == viaMetrics)
    assert(ev.isLargerBetter)
  }

  test("MacroF1Evaluator ParamMap copy preserves configured columns") {
    val ev = new MacroF1Evaluator().setLabelCol("l").setPredictionCol("p")
    val copied = ev.copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(copied.getOrDefault(copied.labelCol) == "l")
    assert(copied.getOrDefault(copied.predictionCol) == "p")
    // and a copy of a default-config evaluator still has the defaults
    val d = new MacroF1Evaluator().copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(d.getOrDefault(d.labelCol) == "label")
  }

  test("sampleGrid is a deterministic without-replacement subset") {
    import org.apache.spark.ml.param.ParamMap
    import org.apache.spark.ml.classification.RandomForestClassifier
    import org.apache.spark.ml.tuning.ParamGridBuilder
    val rf = new RandomForestClassifier()
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(2, 3, 4, 5, 6))
      .addGrid(rf.numTrees, Array(3, 5))
      .build()
    val s1 = Models.sampleGrid(grid, 4, seed = 9)
    val s2 = Models.sampleGrid(grid, 4, seed = 9)
    assert(s1.toSeq == s2.toSeq)                       // deterministic
    assert(s1.length == 4 && s1.distinct.length == 4)  // no replacement
    assert(s1.forall(grid.contains))                   // subset of the grid
    assert(Models.sampleGrid(grid, 99, seed = 9).toSeq == grid.toSeq)
  }

  test("accuracyAndMacroF1 matches the distributed metric queries") {
    val df = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L), (1L, 1L))
      .toDF("label", "pred")
    val counts = df.groupBy("label", "pred").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toSeq
    val (acc, f1) = Models.accuracyAndMacroF1(counts)
    assert(acc == Metrics.accuracy(df, "label", "pred").head().getDouble(0))
    assert(f1 == Metrics.macroAvg(df, "label", "pred")
      .head().getAs[Double]("macro_f1"))
  }

  test("balanced weights are inverse class frequency") {
    val df = Seq.fill(8)(0L).map(l => Tuple1(l)).toDF("label")
      .union(Seq.fill(2)(1L).map(l => Tuple1(l)).toDF("label"))
    val w = Models.withBalancedWeights(df, "label")
      .groupBy("label").max("weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0L) == 10.0 / (2 * 8)) // n/(k*n_c)
    assert(w(1L) == 10.0 / (2 * 2))
  }

  test("random forest learns a separable rule") {
    val rows = (1 to 200).map { i =>
      val x = i.toDouble
      (x, x % 13, if (x > 120) 1L else 0L)
    }
    val df = rows.toDF("a", "b", "label")
    val m = Models.randomForest(Seq("a", "b"), "label", numTrees = 5,
      maxDepth = 4).fit(Models.withBalancedWeights(df, "label"))
    val scored = m.transform(df)
      .selectExpr("label", "CAST(prediction AS LONG) AS pred")
    val acc = Metrics.accuracy(scored, "label", "pred").head().getDouble(0)
    assert(acc > 0.95)
  }

  test("L1 selection keeps the informative feature") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      val x = rng.nextDouble()
      val noise = rng.nextDouble()
      (x, noise, if (x > 0.5) 1L else 0L)
    }
    val df = rows.toDF("signal", "noise", "label")
    val kept = Models.l1FeatureSelection(df, Seq("signal", "noise"), "label",
      regParam = 0.05).map(_._1)
    assert(kept.contains("signal"))
    assert(!kept.contains("noise"))
  }

  test("L1 selection on a 10% hash sample matches full-data selection") {
    // pins the registered l1_feature_selection query's sampling move:
    // WHICH features carry nonzero coefficients is a population-level
    // property, so the deterministic 10% hash sample selects the same
    // set as the full table (full-data path stays covered right here)
    import org.apache.spark.sql.functions._
    val d = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem").select(
      col("l_orderkey"), col("l_quantity"), col("l_discount"), col("l_tax"),
      col("l_extendedprice"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("label"))
    val feats = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")
    val full = Models.l1FeatureSelection(d, feats, "label", regParam = 0.001)
      .map(_._1).toSet
    val sampled = Models.l1FeatureSelection(
      graft.split.Splits.hashSample(d, col("l_orderkey"), pct = 10),
      feats, "label", regParam = 0.001).map(_._1).toSet
    assert(sampled == full)
  }
}
