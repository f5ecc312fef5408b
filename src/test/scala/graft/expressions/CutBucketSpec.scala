package graft.expressions

import graft.SparkTestSession
import graft.transform.BinModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CutBucketSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("native expression matches the when-chain on edge cases") {
    val model = BinModel("x", Array(0.0, 2.0, 2.0, 4.0, 7.5))
    val df = Seq[Option[Double]](
      Some(-1.0), Some(0.0), Some(1.0), Some(2.0), Some(2.5), Some(4.0),
      Some(5.0), Some(7.5), Some(8.0), None, Some(Double.NaN))
      .toDF("x")
    val both = df.select(
      model.expr.as("native"), model.exprWhenChain.as("chain")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("1000-bucket discretization works through codegen (when-chain cannot)") {
    val edges = (0 to 1000).map(_.toDouble).toArray
    val model = BinModel("x", edges)
    val df = (0 until 5000).map(i => i / 5.0).toDF("x")
    val counts = df.select(model.expr.as("b"))
      .groupBy("b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keys.min == 0 && counts.keys.max == 999)
    // value 0.0 -> bucket 0 (include_lowest); 1000.0 would be bucket 999
    assert(counts(0) == 6)  // 0.0,0.2,...,1.0 (right-closed first bucket)
    assert(counts(500) == 5)
  }

  test("interpreted eval path agrees with codegen semantics") {
    val e = CutBucket(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = true),
      Seq(0.0, 1.0, 2.0))
    def evalOf(v: Any) =
      e.eval(org.apache.spark.sql.catalyst.InternalRow(v))
    assert(evalOf(0.0) == 0)   // include_lowest
    assert(evalOf(1.5) == 1)
    assert(evalOf(2.0) == 1)
    assert(evalOf(2.1) == -1)
    assert(evalOf(null) == -1)
    assert(evalOf(Double.NaN) == -1)
  }
}
