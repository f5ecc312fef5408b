package graft.transform

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScalingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("fit computes interpolated percentiles, min, max in one pass") {
    // values 1..5: p25 = 2.0, p50 = 3.0, p75 = 4.0 (linear interp on
    // (n-1)p grid), p01 = 1.04, p99 = 4.96
    val df = (1 to 5).map(_.toDouble).toDF("v")
    val st = Scaling.fit(df, "v")
    assert(st.mn == 1.0 && st.mx == 5.0)
    assert(st.p25 == 2.0 && st.p50 == 3.0 && st.p75 == 4.0)
    assert(math.abs(st.p01 - 1.04) < 1e-9 && math.abs(st.p99 - 4.96) < 1e-9)
  }

  test("minMax, robustZ, winsorize transforms on known stats") {
    val df = (1 to 5).map(_.toDouble).toDF("v")
    val st = Scaling.fit(df, "v")
    val r = df.select(
        st.minMax(col("v")).as("mm"),
        st.robustZ(col("v")).as("rz"),
        st.winsorize(col("v")).as("wz"))
      .orderBy("mm").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    assert(r.map(_.getDouble(1)).toSeq == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
    // winsorize clips 1.0 up to p01 and 5.0 down to p99
    assert(r.map(_.getDouble(2)).toSeq == Seq(1.04, 2.0, 3.0, 4.0, 4.96))
  }
}
