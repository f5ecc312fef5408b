package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("submission CSV sink writes header id,label and round-trips") {
    val df = Seq((1L, 0L), (2L, 1L), (3L, 0L)).toDF("id", "label")
      .withColumn("extra", org.apache.spark.sql.functions.lit("drop me"))
    val dir = java.nio.file.Files.createTempDirectory("sub").toString + "/out"
    Sources.writeSubmissionCsv(df, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("label", LongType)))
    val back = Sources.readCsv(spark, dir, schema)
    assert(back.columns.toSeq == Seq("id", "label"))
    assert(back.count() == 3)
    assert(back.filter("label = 1").select("id").head().getLong(0) == 2L)
  }
}
