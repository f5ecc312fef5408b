package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityClassifierSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // Independent re-derivation of the gram->bucket hash (MessageDigest,
  // not the engine's Column expression).
  private def bucket(gram: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$gram|${Dsir.HashSeed}".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(8).map(b => f"$b%02x").mkString.take(15), 16) % Dsir.Buckets
  }

  private def grams(text: String): Seq[String] = {
    val w = text.split(" ").toSeq
    w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
  }

  val docs = Seq(
    (1L, "en", "a b"), // target: grams a, b, "a b"  (n = 3)
    (2L, "de", "a c")  // raw:    grams a, c, "a c"  (n = 3)
  ).toDF("doc_id", "lang", "text")

  test("round-1 weights match the hand-derived arithmetic exactly") {
    // With w0 = 0 every margin is 0, p = 0.5, p_micro = 500000, so the
    // per-gram residual is sdiv(500000 - y*1e6, 3) = -+166667 and the
    // round-1 weight of a bucket is
    //   -micro(lr * grad / nDocs / 1e6) with grad = sum(rs * count):
    //   lr=256, nDocs=2: 256 * 166667 / 2 / 1e6 * 1e6 = 21333376.
    // The shared gram "a" cancels (grad 0); target-only grams get
    // +21333376, raw-only grams -21333376.
    val (x, ds) = QualityClassifier.featurize(
      docs, "doc_id", "text", Seq("lang"), col("lang") === "en")
    val w = QualityClassifier.train(x, ds, "doc_id", rounds = 1, lr = 256.0)
    val expect = 21333376L
    assert(w(bucket("b")) == expect)
    assert(w(bucket("a b")) == expect)
    assert(w(bucket("c")) == -expect)
    assert(w(bucket("a c")) == -expect)
    assert(w(bucket("a")) == 0L)
  }

  test("trained scorer ranks the target doc first; score is normalized") {
    val (x, ds) = QualityClassifier.featurize(
      docs, "doc_id", "text", Seq("lang"), col("lang") === "en")
    val w = QualityClassifier.train(x, ds, "doc_id", rounds = 2, lr = 256.0)
    val scored = QualityClassifier
      .score(x, ds, "doc_id", Seq("lang"), w)
      .orderBy(col("score_micro").desc, col("doc_id"))
      .collect()
    assert(scored.head.getAs[Long]("doc_id") == 1L)
    assert(scored.head.getAs[Long]("score_micro") > 0)
    assert(scored.last.getAs[Long]("score_micro") < 0)
    // normalization: score_micro = sdiv(margin_micro, n_grams)
    for (r <- scored) {
      val m = r.getAs[Long]("margin_micro")
      val n = r.getAs[Long]("n_grams")
      val q = m * 1.0 / n
      val exp =
        if (q >= 0) math.floor(q + 0.5).toLong
        else -math.floor(-q + 0.5).toLong
      assert(r.getAs[Long]("score_micro") == exp)
    }
  }
}
