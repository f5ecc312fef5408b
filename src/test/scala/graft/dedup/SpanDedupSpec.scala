package graft.dedup

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SpanDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // k=3 windows. Docs 1 and 2 share the span "b c d e" (two overlapping
  // 3-gram windows); doc 3 is unique; doc 4 is shorter than k.
  val docs = Seq(
    (1L, "a b c d e f"),
    (2L, "x b c d e y"),
    (3L, "p q r s t u"),
    (4L, "m n")).toDF("doc_id", "text")

  test("spanFingerprints: one window per position, none below k tokens") {
    val sp = SpanDedup.spanFingerprints(docs, "doc_id", "text", 3)
    val byDoc = sp.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 4L, 2L -> 4L, 3L -> 4L)) // doc 4 emits nothing
    // positions are 1-based and contiguous
    val pos1 = sp.filter($"id" === 1L).select("pos").as[Long].collect().sorted
    assert(pos1.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("duplicatedFingerprints: cross-doc windows only, keeper is min id") {
    val dup = SpanDedup.duplicatedFingerprints(
      SpanDedup.spanFingerprints(docs, "doc_id", "text", 3))
    val rows = dup.collect()
    // shared windows: "b c d" and "c d e" (both in docs 1 and 2)
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("keep_id") == 1L))
    assert(rows.forall(_.getAs[Long]("n_docs") == 2L))
  }

  test("coverageReport: overlapping spans union; keeper has no removable") {
    val rep = SpanDedup.coverageReport(docs, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(rep.keySet == Set(1L, 2L)) // only docs with dup spans
    // two overlapping 3-windows at pos 2,3 cover tokens 2..5 -> 4 tokens
    for (id <- Seq(1L, 2L)) {
      val r = rep(id)
      assert(r.getAs[Long]("n_tokens") == 6L)
      assert(r.getAs[Long]("n_spans") == 4L)
      assert(r.getAs[Long]("n_dup_spans") == 2L)
      assert(r.getAs[Long]("covered_tokens") == 4L)
      assert(r.getAs[Double]("dup_frac") == 0.666667)
    }
    assert(rep(1L).getAs[Long]("n_removable_spans") == 0L) // doc 1 keeps
    assert(rep(2L).getAs[Long]("n_removable_spans") == 2L)
  }

  test("coverage is antitone in window length k (containment law)") {
    // docs 1/2 share a 40-token run; docs 3/4 share only a 12-token run
    // (present at k=8, absent at k=32); doc 5 is unique filler.
    val run40 = (1 to 40).map(i => s"s$i").mkString(" ")
    val run12 = (1 to 12).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $run40 a3 a4"),
      (2L, s"b1 $run40 b2 b3 b4"),
      (3L, s"c1 c2 c3 $run12 c4"),
      (4L, s"d1 $run12 d2 d3 d4"),
      (5L, (1 to 50).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    def cov(k: Int): Map[Long, Long] =
      SpanDedup.coverageReport(docs, "doc_id", "text", k)
        .collect().map(r =>
          r.getAs[Long]("id") -> r.getAs[Long]("covered_tokens")).toMap
    val c8 = cov(8)
    val c32 = cov(32)
    // a duplicated 32-window implies duplicated 8-subwindows: every doc
    // flagged at k=32 is flagged at k=8 with >= coverage
    assert(c32.keySet.subsetOf(c8.keySet))
    for ((id, c) <- c32) assert(c <= c8(id), s"doc $id: k32 $c > k8 ${c8(id)}")
    // and the k-sensitivity is real: the short shared run is k=8-only
    assert(c8.keySet == Set(1L, 2L, 3L, 4L))
    assert(c32.keySet == Set(1L, 2L))
    // exact interval unions: 40 shared tokens at k=32 -> windows at 9
    // positions covering all 40; at k=8 -> 33 positions covering 40
    assert(c32(1L) == 40L && c8(1L) == 40L)
  }

  test("same span repeated within ONE doc is not a cross-doc duplicate") {
    val self = Seq((1L, "a b c a b c"), (2L, "q r s t u v"))
      .toDF("doc_id", "text")
    assert(SpanDedup.coverageReport(self, "doc_id", "text", 3).count() == 0L)
  }
}
