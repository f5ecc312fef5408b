package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("token count / avg length / stopword ratio on known text") {
    val df = Seq("the big cat sat on a mat").toDF("t")
    val r = df.select(
      TextOps.tokenCount(col("t")).as("n"),
      TextOps.avgTokenLen(col("t")).as("avg"),
      TextOps.stopwordRatio(col("t"), Seq("the", "a")).as("sr")).head()
    assert(r.getAs[Int]("n") == 7)
    assert(math.abs(r.getAs[Double]("avg") - 18.0 / 7) < 1e-9)
    assert(math.abs(r.getAs[Double]("sr") - 2.0 / 7) < 1e-9)
  }

  test("bpe pretokenizer splits letter/digit/punct runs like GPT-2 shape") {
    val df = Seq("sort 12 rows, then re-merge!").toDF("t")
    val toks = df.select(TextOps.bpeTokens(col("t"))).head().getSeq[String](0)
    assert(toks == Seq(
      "sort", " 12", " rows", ",", " then", " re", "-", "merge", "!"))
    // whitespace count under-reports: 5 ws tokens vs 9 pretokens
    val r = df.select(
      TextOps.tokenCount(col("t")).as("ws"),
      TextOps.bpeTokenCount(col("t")).as("bpe")).head()
    assert(r.getAs[Int]("ws") == 5 && r.getAs[Int]("bpe") == 9)
  }

  test("countToken is overlap-safe and exact") {
    val df = Seq("the the theater the").toDF("t")
    assert(df.select(TextOps.countToken(col("t"), "the")).head().getInt(0) == 3)
  }

  test("langId picks max marker score with alphabetical tie-break") {
    val df = Seq(
      "the a the",        // en markers
      "hash merge hash",  // de markers
      "plain words only"  // all scores 0 -> tie -> 'de' (alphabetical)
    ).toDF("t")
    val got = df.select(TextOps.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "de"))
  }

  test("md5 fingerprint is 16 hex chars and deterministic") {
    val df = Seq("hello world").toDF("t")
    val fp = df.select(TextOps.fingerprintMd5(col("t"))).head().getString(0)
    assert(fp == "5eb63bbbe01eeed0") // md5("hello world") prefix
  }
}
