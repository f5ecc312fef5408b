package graft.text

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TermCosineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("exact cosine on candidate pairs; common-term-only pairs blocked") {
    // docs 1/2: identical rare-term content -> cosine 1.0
    // doc 3: shares only the ubiquitous token with 1/2
    // docs 4/5: overlap on one rare token with differing counts
    val docs = Seq(
      (1L, "common rare1 rare2"),
      (2L, "common rare1 rare2"),
      (3L, "common other1 other2"),
      (4L, "common rare3 rare3 rare4"),
      (5L, "common rare3 extra")).toDF("doc_id", "text")
    val post = TermCosine.postings(docs, "doc_id", "text")
    // dfCap = 2: 'common' (df 5) is never an index key
    val got = TermCosine.cosineTopK(post, dfCap = 2, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got((1L, 2L)) == ((3L, 1.0)))
    // (4,5): dot = 1*1 (common) + 2*1 (rare3) = 3; |4|^2 = 1+4+1 = 6,
    // |5|^2 = 3 -> cos = 3 / sqrt(18)
    val (dot45, cos45) = got((4L, 5L))
    assert(dot45 == 3L)
    assert(math.abs(cos45 - 3.0 / math.sqrt(18.0)) < 1e-6)
    // doc 3 pairs share no rare term -> candidate-blocked
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
    // the full-vector rerank counts COMMON terms in dot/norms (1,2 dot
    // includes 'common': 3 terms, not 2)
  }
}
