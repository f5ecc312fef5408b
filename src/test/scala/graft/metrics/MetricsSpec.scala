package graft.metrics

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("macro-F1 counts a never-predicted class as F1=0 (sklearn zero_division=0)") {
    // labels {0,0,0,1}, preds all 0: class 0 P=3/4 R=1 F1=6/7; class 1 F1=0
    val df = Seq((0, 0), (0, 0), (0, 0), (1, 0)).toDF("label", "pred")
    val r = Metrics.macroAvg(df, "label", "pred").head()
    val f1c0 = 2 * 0.75 * 1.0 / 1.75
    assert(math.abs(r.getAs[Double]("macro_f1") - f1c0 / 2) < 1e-6)
  }

  test("perfect predictions give macro P=R=F1=1 and accuracy 1") {
    val df = Seq((0, 0), (1, 1), (2, 2)).toDF("label", "pred")
    val r = Metrics.macroAvg(df, "label", "pred").head()
    assert(r.getAs[Double]("macro_f1") == 1.0)
    assert(Metrics.accuracy(df, "label", "pred").head().getDouble(0) == 1.0)
  }

  test("ROC-AUC: perfect separation = 1.0, random-ish = 0.5, ties handled") {
    val perfect = Seq((0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)).toDF("score", "label")
    assert(Metrics.rocAuc(perfect, "score", "label").head().getDouble(0) == 1.0)
    val coin = Seq((0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)).toDF("score", "label")
    assert(Metrics.rocAuc(coin, "score", "label").head().getDouble(0) == 0.5)
  }

  test("sklearn cross-check: known mixed case") {
    // sklearn.roc_auc_score([0,0,1,1], [.1,.4,.35,.8]) = 0.75
    val df = Seq((0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1)).toDF("score", "label")
    val got = Metrics.rocAuc(df, "score", "label").head().getDouble(0)
    assert(got == 0.75)
  }

  test("confusion matrix counts") {
    val df = Seq((0, 0), (0, 1), (1, 1), (1, 1)).toDF("label", "pred")
    val m = Metrics.confusion(df, "label", "pred")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m == Map((0, 0) -> 1L, (0, 1) -> 1L, (1, 1) -> 2L))
  }
}
