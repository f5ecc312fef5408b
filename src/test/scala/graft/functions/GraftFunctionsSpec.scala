package graft.functions

import graft.SparkTestSession
import graft.stats.Stats
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("single-pass entropy aggregator agrees with the composed aggregation") {
    val df = Seq(0L, 0L, 0L, 1L, 1L, 2L).toDF("label")
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("labels_v")
    val single = spark.sql("SELECT entropy_agg(label) AS e FROM labels_v")
      .head().getDouble(0)
    val composed = Stats.entropyGini(df, "label").head().getDouble(0)
    assert(math.abs(single - composed) < 1e-6)
  }

  test("entropy aggregator handles one-class and splits across partitions") {
    GraftFunctions.register(spark)
    val pure = spark.range(0, 1000, 1, 8)
      .selectExpr("CAST(7 AS BIGINT) AS label")
    pure.createOrReplaceTempView("pure_v")
    assert(spark.sql("SELECT entropy_agg(label) FROM pure_v")
      .head().getDouble(0) == 0.0)
    val uniform = spark.range(0, 1024, 1, 8)
      .selectExpr("CAST(id % 2 AS BIGINT) AS label")
    uniform.createOrReplaceTempView("uniform_v")
    assert(spark.sql("SELECT entropy_agg(label) FROM uniform_v")
      .head().getDouble(0) == 1.0)
  }

  test("dot_product is callable from SQL over float arrays") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
    assert(got == 11.0)
  }

  test("cut_bucket is callable from SQL with literal edges") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT cut_bucket(CAST(v AS DOUBLE), array(0.0D, 2.0D, 4.0D)) AS b " +
        "FROM VALUES (0.0),(1.0),(2.5),(4.0),(9.0) AS t(v)")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 1, 1, -1))
  }
}
