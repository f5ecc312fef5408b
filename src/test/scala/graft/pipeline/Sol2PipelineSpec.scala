package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class Sol2PipelineSpec extends AnyFunSuite with SparkTestSession {

  test("Sol_2-style 3-model comparison + CV on synthetic house data") {
    val train = HouseSynth.labeled(spark, 1200, seed = 11)
    val r = Sol2Pipeline.run(train, Sol2Pipeline.Config(cvFolds = 2))
    val rows = r.report.collect()
    assert(rows.length == 3)
    assert(Set("logreg", "random_forest", "gbt")(r.bestModel))
    // report is best-first by macro-F1
    val f1s = rows.map(_.getDouble(2))
    assert(f1s.sorted.reverse.toSeq == f1s.toSeq)
    assert(f1s.head > 0.7)        // separable signal -> a good model exists
    assert(r.cvBestMacroF1 > 0.7) // CV-selected RF also learns it
    assert(r.featureCols.contains("property_age_category_encoded"))
  }
}
