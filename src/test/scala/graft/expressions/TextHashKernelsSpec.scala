package graft.expressions

import graft.SparkTestSession
import graft.dedup.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled gram/span hashing kernels to the composed forms
  * they replace (r16): identical bucket multisets and fingerprint
  * arrays, including empty strings, multiple/trailing spaces, and
  * multi-byte characters.
  */
class TextHashKernelsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, ""),
    (3L, "one"),
    (4L, "a  b"), // double space: empty middle token
    (5L, "trailing space "),
    (6L, "héllo wörld déjà vu encore une fois"))
    .toDF("doc_id", "text")

  private def composedGrams(seed: Int, buckets: Int): Column = {
    val words = split(col("text"), " ")
    val n1 = greatest(size(words) - 1, lit(0))
    val bigrams = zip_with(
      slice(words, lit(1), n1), slice(words, lit(2), n1),
      (a: Column, b: Column) => concat(a, lit(" "), b))
    transform(concat(words, bigrams),
      g => Dedup.md5Hash60(g, seed) % buckets)
  }

  test("GramBuckets equals composed md5Hash60-per-gram form") {
    val rows = texts.select(
      TextHashKernels.gramBuckets(col("text"), 11, 4096).as("fast"),
      composedGrams(11, 4096).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("SpanGrams equals composed windowed array_join form") {
    for (k <- Seq(2, 3, 6)) {
      val slow = expr(
        s"if(size(split(text, ' ')) < $k, array(), " +
          s"transform(sequence(1, size(split(text, ' ')) - ${k - 1}), " +
          s"i -> array_join(slice(split(text, ' '), i, $k), ' ')))")
      val rows = texts.select(
        TextHashKernels.spanGrams(col("text"), k).as("fast"),
        slow.as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
      }
    }
  }

  test("SpanFps equals composed windowed array_join+md5 form") {
    for (k <- Seq(2, 8)) {
      val toks = split(col("text"), " ")
      val slow = when(size(toks) >= k,
        transform(
          sequence(lit(1), size(toks) - (k - 1)),
          i => conv(substring(
            md5(array_join(slice(toks, i, lit(k)), " ")),
            1, 15), 16, 10).cast("long")))
        .otherwise(array().cast("array<long>"))
      val rows = texts.select(
        TextHashKernels.spanFps(col("text"), k).as("fast"),
        slow.as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k")
      }
    }
  }
}
