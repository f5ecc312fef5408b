package graft.tree

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TreeIOSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("save/load round-trips a trained tree exactly") {
    val rows = for {
      x <- 1 to 10; y <- 1 to 10
    } yield (x.toDouble, y.toDouble, if (x > 5 && y > 5) 1L else 0L)
    val df = rows.toDF("x", "y", "label")
    val m = DecisionTree.fit(df, Seq("x", "y"), "label", TreeParams(maxDepth = 2))
    val path = java.nio.file.Files.createTempFile("tree", ".json").toString
    TreeIO.save(m, path)
    val loaded = TreeIO.load(path)
    assert(loaded.root == m.root)
    assert(loaded.features == m.features)
    assert(loaded.labels == m.labels)
    // loaded model predicts identically
    val a = m.transform(df, "p").select("p").collect().map(_.getLong(0)).toSeq
    val b = loaded.transform(df, "p").select("p").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
