package graft.text

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def packsOf(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packGreedy(
        rows.toDF("g", "id", "w"), "g", "id", col("w"), budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap

  test("greedy packing fills to budget then resets") {
    // 3+3 fits in 6; the next 3 overflows -> new pack; 6 exactly fills one
    val p = packsOf(
      Seq(("a", 1L, 3L), ("a", 2L, 3L), ("a", 3L, 3L), ("a", 4L, 6L)), 6L)
    assert(p(("a", 1L)) == 0L && p(("a", 2L)) == 0L)
    assert(p(("a", 3L)) == 1L)
    assert(p(("a", 4L)) == 2L)
  }

  test("oversized doc gets its own pack; groups pack independently") {
    val p = packsOf(
      Seq(("a", 1L, 10L), ("a", 2L, 2L), ("b", 7L, 5L), ("b", 8L, 2L)), 6L)
    assert(p(("a", 1L)) == 0L) // oversized but first -> pack 0 alone
    assert(p(("a", 2L)) == 1L) // 10+2 > 6 -> reset
    assert(p(("b", 7L)) == 0L && p(("b", 8L)) == 1L) // 5+2 > 6
  }

  test("packing is ordered by id within a group regardless of input order") {
    val p = packsOf(
      Seq(("a", 3L, 4L), ("a", 1L, 4L), ("a", 2L, 4L)), 8L)
    // id order 1,2,3: 4+4 fills pack 0, id 3 starts pack 1
    assert(p(("a", 1L)) == 0L && p(("a", 2L)) == 0L && p(("a", 3L)) == 1L)
  }
}
