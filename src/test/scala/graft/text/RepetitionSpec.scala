package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("scores: hand-computed repetition ratios") {
    // "a a a b" -> top word a: 3/4; bigrams: "a a" x2, "a b" -> 2/3
    val df = Seq(
      (1L, "a a a b"),
      (2L, "x y"),
      (3L, "solo")).toDF("doc_id", "text")
    val r = Repetition.scores(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 3)
    val r1 = r(0)
    assert(r1.getAs[Long]("n_words") == 4L)
    assert(math.abs(r1.getAs[Double]("top_word_ratio") - 0.75) < 1e-9)
    assert(math.abs(r1.getAs[Double]("top_bigram_ratio") - 2.0 / 3) < 1e-9)
    assert(math.abs(r1.getAs[Double]("mean_word_len") - 1.0) < 1e-9)
    val r2 = r(1)
    assert(r2.getAs[Long]("n_words") == 2L)
    assert(math.abs(r2.getAs[Double]("top_word_ratio") - 0.5) < 1e-9)
    assert(math.abs(r2.getAs[Double]("top_bigram_ratio") - 1.0) < 1e-9)
    // single word: no bigrams -> ratio 0.0, not null
    val r3 = r(2)
    assert(r3.getAs[Long]("n_words") == 1L)
    assert(r3.getAs[Double]("top_bigram_ratio") == 0.0)
    assert(math.abs(r3.getAs[Double]("mean_word_len") - 4.0) < 1e-9)
  }

  test("scoreColumns (pure projection) agrees with scores (explode+agg)") {
    val docs = Seq(
      (1L, "a a a b"), (2L, "x y"), (3L, "solo"),
      (4L, "p q p q p q r"), (5L, "m n o m n o m n")).toDF("doc_id", "text")
    val viaAgg = Repetition.scores(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val viaExpr = docs
      .select(col("doc_id") +: Repetition.scoreColumns(col("text")): _*)
      .orderBy("doc_id").collect()
    viaAgg.zip(viaExpr).foreach { case (a, e) =>
      assert(a.getAs[Long]("n_words") == e.getAs[Long]("n_words"))
      Seq("mean_word_len", "top_word_ratio", "top_bigram_ratio").foreach {
        c => assert(
          math.abs(a.getAs[Double](c) - e.getAs[Double](c)) < 1e-9,
          s"doc ${a.get(0)} col $c: agg=${a.getAs[Double](c)} expr=${e.getAs[Double](c)}")
      }
    }
  }

  test("bigrams expression: empty and short arrays") {
    val df = Seq("", "one", "one two", "a b c").toDF("text")
      .select(Repetition.bigrams(split(col("text"), " ")).as("bg"))
    val got = df.collect().map(_.getSeq[String](0).toList)
    // split("") yields [""] -> single token -> no bigrams
    assert(got(0) == Nil)
    assert(got(1) == Nil)
    assert(got(2) == List("one two"))
    assert(got(3) == List("a b", "b c"))
  }
}
