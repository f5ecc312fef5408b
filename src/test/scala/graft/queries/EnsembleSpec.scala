package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EnsembleSpec extends AnyFunSuite with SparkTestSession {

  test("bagged vote: histogram partitions rows, majority rule holds") {
    val df = EnsembleQueries.baggedVote
      .run(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val nRows = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    assert(total == nRows, "confusion histogram must partition the table")
    rows.foreach { r =>
      val votes = r.getAs[Long]("votes")
      val pred = r.getAs[Long]("pred")
      assert(votes >= 0 && votes <= 3)
      assert(pred == (if (votes >= 2) 1L else 0L), "majority rule")
    }
    // determinism: a second run (fresh fits) reproduces the histogram
    val again = EnsembleQueries.baggedVote
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }
}
