package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("holdoutScore hand-computed: add-one smoothing incl. OOV mass") {
    // reference tokens {a,a,b}: N=3, V=2 -> denom 5; p(a)=3/5, OOV p=1/5.
    // target doc "a c": avg_nll = (-ln 0.6 - ln 0.2) / 2, 1 OOV token.
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text")
    val tgt = Seq((2L, "a c")).toDF("doc_id", "text")
    val r = LmScore.holdoutScore(ref, tgt, "doc_id", "text").head()
    assert(r.getAs[Long]("n_tokens") == 2)
    assert(r.getAs[Long]("n_oov") == 1)
    val want = (-math.log(0.6) - math.log(0.2)) / 2
    assert(math.abs(r.getAs[Double]("avg_nll") - want) < 1e-12)
    assert(math.abs(r.getAs[Double]("ppl") - math.exp(want)) < 1e-12)
  }

  test("holdoutScore of in-vocabulary uniform text has zero OOV") {
    val ref = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val tgt = Seq((2L, "x y"), (3L, "y y")).toDF("doc_id", "text")
    val rows = LmScore.holdoutScore(ref, tgt, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("n_oov")).forall(_ == 0L))
    // p(x)=p(y)=(2+1)/(4+2)=0.5 -> every doc scores exactly ln 2.
    rows.foreach(r =>
      assert(math.abs(r.getAs[Double]("avg_nll") - math.log(2)) < 1e-12))
  }
}
