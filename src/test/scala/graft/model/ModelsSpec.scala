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
}
