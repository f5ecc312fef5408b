package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("int8 codes, scale, saturation, and reconstruction bound") {
    // values chosen away from .5 code boundaries (no float-tie risk):
    // scale = 1/127; codes 127, 0.25*127=31.75->32, -0.6*127=-76.2->-76
    val df = Seq(
      (1L, Seq(1.0f, 0.25f, -0.6f)),
      (2L, Seq(0.0f, 0.0f)) // zero vector -> scale 0, codes 0
    ).toDF("vec_id", "embedding")
    val q = Quantize.withInt8(df, "embedding", "scale", "q")
      .orderBy("vec_id").collect()
    assert(math.abs(q(0).getAs[Double]("scale") - 1.0 / 127) < 1e-12)
    assert(q(0).getSeq[Int](q(0).fieldIndex("q")).toList == List(127, 32, -76))
    assert(q(1).getAs[Double]("scale") == 0.0)
    assert(q(1).getSeq[Int](q(1).fieldIndex("q")).toList == List(0, 0))

    val r = Quantize.reportInt8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(r(0).getAs[Int]("n_saturated") == 1)
    // max error of symmetric int8 is bounded by scale/2
    assert(r(0).getAs[Double]("max_abs_err") <= 0.01 / 2 + 1e-12)
    assert(r(1).getAs[Double]("max_abs_err") == 0.0)
  }

  test("round-trip error bounded by scale/2 on random vectors") {
    val rng = new scala.util.Random(7)
    val df = (1L to 50L)
      .map(i => (i, Seq.fill(16)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val bad = Quantize.reportInt8(df, "vec_id", "embedding")
      .filter(org.apache.spark.sql.functions.expr("max_abs_err > scale / 2 + 1e-12"))
    assert(bad.count() == 0)
  }
}
