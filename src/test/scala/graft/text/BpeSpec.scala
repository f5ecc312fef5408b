package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge training against hand-computed merges: pair counting is
  * weighted by word frequency, the argmax tie-breaks lexicographically,
  * and merge application is leftmost-first non-overlapping (the
  * sentinel-space replace) — plus the novelty helper's first-occurrence
  * semantics.
  */
class BpeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("hand-computed merge sequence on a weighted micro-corpus") {
    // corpus: "low low lower" -> words: low x2, lower x1
    // round 1 pairs: (l,o) 3, (o,w) 3, (w,e) 1, (e,r) 1
    //   tie 3 vs 3 -> lexicographic: (l,o) wins -> "lo"
    // round 2: (lo,w) 3, (w,e) 1, (e,r) 1 -> "low"
    // round 3: (low,e) 1, (e,r) 1 -> lexicographic: (e,r) wins -> "er"
    // round 4: (low,er) 1 -> "lower"
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val m = Bpe.train(spark, docs, col("text"), rounds = 4)
      .orderBy("round").collect()
    assert(m.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq == Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L),
      (4, "low", "er", "lower", 1L)))
  }

  test("leftmost-first greedy application: aaa merges once, not twice") {
    // word "aaa": pairs (a,a) x2 -> merge (a,a). Greedy left-to-right
    // consumes the first two a's -> tokens [aa, a]; round 2's top pair
    // is then (aa, a).
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = Bpe.train(spark, docs, col("text"), rounds = 2)
      .orderBy("round").collect()
    assert(m(0).getString(3) == "aa" && m(0).getLong(4) == 4L)
    assert(m(1).getString(1) == "aa" && m(1).getString(2) == "a" &&
      m(1).getLong(4) == 2L)
  }

  test("encode: post-merge vocab carries the per-word token counts") {
    // rounds=2 trains (l,o)->lo then (lo,w)->low (see test above), so
    // "low" encodes to 1 token and "lower" to [low, e, r] = 3.
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val (_, v) = Bpe.trainWithVocab(spark, docs, col("text"), 2)
    val enc = v
      .select(col("word"), size(split(trim(col("toks")), " ")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(enc == Map("low" -> 1, "lower" -> 3))
  }

  test("vocab exhaustion stops the loop early") {
    // single 2-char word: exactly one merge possible
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = Bpe.train(spark, docs, col("text"), rounds = 5).collect()
    assert(m.length == 1 && m(0).getString(3) == "ab")
  }

  test("gram novelty: exact re-crawl scores 0 novel, new text all-novel") {
    val docs = Seq(
      (1L, "a b c d", "s1"),   // grams {a b c, b c d} -> both first here
      (2L, "a b c d", "s1"),   // exact dup -> 0 novel of 2
      (3L, "x y z w", "s2"),   // disjoint -> 2 novel of 2
      (4L, "a b", "s2")        // < 3 tokens -> drops out
    ).toDF("doc_id", "text", "source")
    val r = TextOps.gramNovelty(docs, "doc_id", "text", Seq("source"))
      .orderBy("doc_id").collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("total"),
      x.getAs[Long]("novel"))).toSeq ==
      Seq((1L, 2L, 2L), (2L, 2L, 0L), (3L, 2L, 2L)))
  }
}
