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

  private def chunksOf(txt: String, size: Int, overlap: Int): Seq[String] =
    Seq(txt).toDF("t")
      .select(TextOps.chunkTokens(col("t"), size, overlap).as("c"))
      .head().getSeq[scala.collection.Seq[String]](0)
      .map(_.mkString(" ")).toList

  test("chunkTokens: sliding windows with overlap, truncated tail") {
    // 10 tokens, chunkSize 4, overlap 1 (stride 3): starts 0,3,6 cover to
    // token 10 -> chunks [1..4],[4..7],[7..10]
    val txt = (1 to 10).map(i => s"t$i").mkString(" ")
    assert(chunksOf(txt, 4, 1) == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))

    // 11 tokens: one more start at 9 -> 2-token tail
    val txt11 = (1 to 11).map(i => s"t$i").mkString(" ")
    val c11 = chunksOf(txt11, 4, 1)
    assert(c11.length == 4 && c11.last == "t10 t11")

    // short doc: single truncated chunk
    assert(chunksOf("a b", 4, 1) == Seq("a b"))
  }
}
