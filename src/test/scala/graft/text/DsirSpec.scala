package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: featurizer shape, the exact micro
  * log-ratio arithmetic (re-derived in scala.math against the same
  * formula), selection direction on the real corpus, and Gumbel-key
  * determinism.
  */
class DsirSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  /** Mirror of the per-bucket model term: one ln of the smoothed ratio,
    * half-away micro quantization.
    */
  private def microLr(ct: Long, cr: Long, nt: Long, nr: Long): Long = {
    val b = Dsir.Buckets.toDouble
    val lr = math.log(((ct + 1.0) * (nr + b)) / ((cr + 1.0) * (nt + b)))
    if (lr >= 0) math.floor(lr * 1e6 + 0.5).toLong
    else -math.floor(-lr * 1e6 + 0.5).toLong
  }

  test("featurizer: unigrams + bigrams, one row per occurrence") {
    val docs = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val g = Dsir.hashedGrams(docs, "doc_id", "text", Nil)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(1L -> 5L, 2L -> 1L)) // 3 uni + 2 bi; 1 uni + 0 bi
  }

  test("doc weights equal the hand-derived integer micro sums") {
    // 6 distinct grams, no bucket collisions (asserted): the en doc's
    // grams have (ct=1, cr=1), the zh doc's (ct=0, cr=1); nt=3, nr=6.
    val docs = Seq(
      (1L, "aa bb", "en"), (2L, "cc dd", "zh")).toDF("doc_id", "text", "lang")
    val grams = Dsir.hashedGrams(docs, "doc_id", "text", Seq("lang"))
    assert(grams.select("bucket").distinct().count() == 6)
    val w = Dsir
      .docWeights(docs, "doc_id", "text", Seq("lang"), col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w(1L) == 3 * microLr(1, 1, 3, 6))
    assert(w(2L) == 3 * microLr(0, 1, 3, 6))
    assert(w(1L) > 0 && w(2L) < 0) // target-like up, off-target down
  }

  test("selection direction: top-100 on sf0.001 is en-enriched") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpusEn =
      docs.filter(col("lang") === "en").count().toDouble / docs.count()
    val top = Dsir
      .docWeights(docs, "doc_id", "text", Seq("lang"), col("lang") === "en")
      .orderBy(col("weight_micro").desc, col("doc_id")).limit(100)
      .collect()
    val topEn = top.count(_.getString(1) == "en") / 100.0
    assert(topEn > corpusEn + 0.2,
      s"top-100 en share $topEn not enriched over corpus $corpusEn")
  }

  test("gumbel keys are deterministic and break weight ties") {
    val ids = (1L to 50L).toDF("doc_id")
    val k1 = ids.select(col("doc_id"), Dsir.gumbelKey(col("doc_id")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val k2 = ids.select(col("doc_id"), Dsir.gumbelKey(col("doc_id")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(k1 == k2)
    assert(k1.map(_._2).distinct.size == 50) // ties broken by noise
  }
}
