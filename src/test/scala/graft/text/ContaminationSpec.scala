package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ContaminationSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("overlap: containment fraction of bench trigrams, distinct grams") {
    // bench doc 100: "a b c d" -> trigrams {a b c, b c d} (2 grams)
    // corpus 1 contains "a b c" once (repeated -> still 1 distinct) -> 1/2
    // corpus 2 contains both -> 2/2; corpus 3 shares none
    val corpus = Seq(
      (1L, "x a b c y a b c"),
      (2L, "a b c d e"),
      (3L, "q r s t")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val r = Contamination
      .overlap(corpus, bench, "doc_id", "text", n = 3, minFrac = 0.0)
      .orderBy("corpus_id").collect()
    assert(r.map(_.getAs[Long]("corpus_id")).toSeq == Seq(1L, 2L))
    assert(r(0).getAs[Long]("shared") == 1L)
    assert(math.abs(r(0).getAs[Double]("overlap_frac") - 0.5) < 1e-9)
    assert(r(1).getAs[Long]("shared") == 2L)
    assert(math.abs(r(1).getAs[Double]("overlap_frac") - 1.0) < 1e-9)
  }

  test("minFrac filters below-threshold pairs") {
    val corpus = Seq((1L, "a b c z z z")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    // bench has 6 trigrams, shares 1 -> 1/6 < 0.2
    val r = Contamination
      .overlap(corpus, bench, "doc_id", "text", n = 3, minFrac = 0.2)
    assert(r.count() == 0)
  }

  test("short documents produce no grams and no pairs") {
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val r = Contamination
      .overlap(corpus, bench, "doc_id", "text", n = 3, minFrac = 0.0)
    assert(r.count() == 0)
  }
}
