package graft.model

import graft.SparkTestSession
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.tuning.ParamGridBuilder
import org.scalatest.funsuite.AnyFunSuite

class CrossValidateSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("grid search with macro-F1 scoring picks a working model") {
    val rows = (1 to 300).map { i =>
      (i.toDouble, (i % 17).toDouble, if (i > 180) 1L else 0L)
    }
    val df = rows.toDF("a", "b", "label")
    val pipeline = Models.randomForest(Seq("a", "b"), "label", numTrees = 3)
    val rf = pipeline.getStages.last.asInstanceOf[RandomForestClassifier]
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(2, 4))
      .build()
    val cv = Models.crossValidate(df, "label", pipeline, grid, numFolds = 2)
    assert(cv.avgMetrics.length == 2)
    assert(cv.avgMetrics.max > 0.8) // separable data -> high macro-F1
  }

  test("random search CVs only the sampled subset (RandomizedSearchCV)") {
    val rows = (1 to 300).map { i =>
      (i.toDouble, (i % 17).toDouble, if (i > 180) 1L else 0L)
    }
    val df = rows.toDF("a", "b", "label")
    val pipeline = Models.randomForest(Seq("a", "b"), "label", numTrees = 3)
    val rf = pipeline.getStages.last.asInstanceOf[RandomForestClassifier]
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(1, 2, 3, 4))
      .build()
    val cv = Models.randomSearch(df, "label", pipeline, grid, nIter = 2,
      numFolds = 2, seed = 5)
    assert(cv.avgMetrics.length == 2) // 2 of 4 grid points evaluated
    assert(cv.getEstimatorParamMaps.toSeq ==
      Models.sampleGrid(grid, 2, seed = 5).toSeq) // the seeded subset
  }
}
