package graft.model

import graft.SparkTestSession
import org.apache.spark.ml.PipelineModel
import org.scalatest.funsuite.AnyFunSuite

/** S3: native MLlib pipeline persistence (the reference joblib-dumps its
  * model package; Sol_2.ipynb cell 15).
  */
class PipelinePersistenceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("fitted pipeline save/load predicts identically") {
    val rows = (1 to 200).map(i =>
      (i.toDouble, (i % 13).toDouble, if (i > 120) 1L else 0L))
    val df = rows.toDF("a", "b", "label")
    val model = Models.randomForest(Seq("a", "b"), "label", numTrees = 3,
      maxDepth = 3).fit(Models.withBalancedWeights(df, "label"))
    val path = java.nio.file.Files.createTempDirectory("plm").toString + "/m"
    model.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    val a = model.transform(df).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    val b = loaded.transform(df).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }
}
