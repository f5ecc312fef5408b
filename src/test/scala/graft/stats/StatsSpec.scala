package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("entropy/gini closed-form: uniform binary = (1.0, 0.5)") {
    val df = Seq(0, 0, 1, 1).toDF("label")
    val r = Stats.entropyGini(df, "label").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.5)
  }

  test("entropy of pure column is 0") {
    val df = Seq(7, 7, 7).toDF("label")
    val r = Stats.entropyGini(df, "label").head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("profile covers count/nulls/distinct/mean/min/max") {
    val df = Seq(Some(1.0), Some(2.0), Some(2.0), None).toDF("x")
    val r = Stats.profileNumeric(df, Seq("x" -> 0)).head()
    assert(r.getAs[Long]("n_rows") == 3)
    assert(r.getAs[Long]("n_nulls") == 1)
    assert(r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[Double]("mean") == (5.0 / 3 * 1e6).round / 1e6)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 2.0)
  }

  test("valueCounts shares sum to 1") {
    val df = Seq("a", "a", "b", "c").toDF("v")
    val shares = Stats.valueCounts(df, "v").select("share").as[Double].collect()
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("skew/kurtosis match pandas on a known sample") {
    // pandas: pd.Series([1,2,3,4,10]).skew() = 1.697056, .kurt() = 3.152
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("x")
    val r = Stats.skewKurtosis(df, Seq("x" -> 0)).head()
    assert(math.abs(r.getDouble(1) - 1.697056) < 1e-5)
    assert(math.abs(r.getDouble(2) - 3.152) < 1e-5)
  }
}
