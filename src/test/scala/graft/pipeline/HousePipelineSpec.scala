package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 item 4: end-to-end pipeline test on synthetic house-like
  * data with the reference train/test schema (FIXTURES.md §1).
  */
class HousePipelineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("reference pipeline shape produces a valid submission") {
    // label correlated with affordability so the tree has signal
    val train = HouseSynth.synth(spark, 1500, 0, seed = 1)
      .selectExpr("*",
        "CAST(CASE WHEN customer_salary * 8 > price THEN 1 ELSE 0 END AS BIGINT) AS label")
    val test = HouseSynth.synth(spark, 600, 200000, seed = 2)
    val r = HousePipeline.run(train, test,
      HousePipeline.Config(tree = graft.tree.TreeParams(
        maxDepth = 4, minSamplesSplit = 20, minSamplesLeaf = 10,
        criterion = "entropy")))

    val sub = r.submission.collect()
    assert(sub.length == 600)                      // row count = test rows
    assert(r.submission.columns.toSeq == Seq("id", "label"))
    assert(sub.forall(row => Set(0L, 1L)(row.getLong(1)))) // label domain
    assert(sub.map(_.getLong(0)).distinct.length == 600)   // ids preserved
    assert(r.valAccuracy > 0.8)                    // learnable signal
    assert(r.valMacroF1 > 0.5)
    assert(r.featureCols.nonEmpty && r.model.depth > 0)
  }

  test("pipeline is deterministic for a fixed seed") {
    val train = HouseSynth.synth(spark, 800, 0, seed = 3)
      .selectExpr("*",
        "CAST(CASE WHEN customer_salary * 8 > price THEN 1 ELSE 0 END AS BIGINT) AS label")
    val test = HouseSynth.synth(spark, 200, 100000, seed = 4)
    val cfg = HousePipeline.Config(tree = graft.tree.TreeParams(
      maxDepth = 3, minSamplesSplit = 20, minSamplesLeaf = 10))
    val a = HousePipeline.run(train, test, cfg)
    val b = HousePipeline.run(train, test, cfg)
    assert(a.model.root == b.model.root)
    assert(a.submission.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      sameElements
      b.submission.collect().map(r => (r.getLong(0), r.getLong(1))).sorted)
  }
}
