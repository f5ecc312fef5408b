package graft.expressions

import graft.SparkTestSession
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled shingle/minhash kernels to the composed-expression
  * forms they replace (r16 optimization): values must be bit-identical,
  * including the short/empty-text edge where
  * `sequence(1, greatest(len-k+1, 0))` descends to [1, 0] and yields the
  * whole text as the single shingle.
  */
class ShingleMinHashSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val texts = Seq(
    (1L, "aa bb cc dd aa bb"),
    (2L, ""), // empty: one "" shingle
    (3L, "ab"), // shorter than k: one whole-text shingle
    (4L, "abc"), // exactly k
    (5L, "héllo wörld héllo"), // multi-byte chars: char positions, not bytes
    (6L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  private def composedShingles(k: Int) =
    array_distinct(expr(
      s"transform(sequence(1, greatest(length(text) - ${k - 1}, 0))," +
        s" i -> substring(text, i, $k))"))

  test("ShingleSet equals composed array_distinct(transform(...)) form") {
    for (k <- Seq(3, 4)) {
      val rows = texts.select(
        ShingleMinHash.shingleSet(col("text"), k).as("fast"),
        composedShingles(k).as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("ShingleList equals composed transform(...) occurrence form") {
    for (k <- Seq(3, 4)) {
      val rows = texts.select(
        ShingleMinHash.shingleList(col("text"), k).as("fast"),
        expr(s"transform(sequence(1, greatest(length(text) - ${k - 1}, 0))," +
          s" i -> substring(text, i, $k))").as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"k=$k: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("MinHashSig equals minhashSignaturesPerm over shingleSet") {
    val slow = Dedup.minhashSignaturesPerm(
      Dedup.shingleSet(texts, "doc_id", "text", 3), 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fast = Dedup.minhashSigsPerRow(texts, "doc_id", "text", 3, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (id, sig) =>
      assert(sig == slow(id), s"doc $id signature mismatch")
    }
  }

  test("null text is dropped like the exploded form") {
    val withNull = Seq((1L, "abcdef"), (2L, null))
      .toDF("doc_id", "text")
    val ids = Dedup.minhashSigsPerRow(withNull, "doc_id", "text", 3, 8)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
