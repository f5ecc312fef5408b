package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LabelPropSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def communities(
      edges: Seq[(Long, Long, Long)], iters: Int = 4): Map[Long, Long] =
    LabelProp.propagate(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iters).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques joined by one weak edge split into two communities") {
    val a = Seq((1L, 2L, 5L), (2L, 3L, 5L), (1L, 3L, 5L))
    val b = Seq((4L, 5L, 5L), (5L, 6L, 5L), (4L, 6L, 5L))
    val bridge = Seq((3L, 4L, 1L))
    val c = communities(a ++ b ++ bridge)
    assert(c(1L) === c(2L) && c(2L) === c(3L))
    assert(c(4L) === c(5L) && c(5L) === c(6L))
    assert(c(1L) !== c(4L))
  }

  test("heavier neighbour label wins; ties break to the smaller label") {
    // node 3's neighbours: 1 (w=2) and 2 (w=1) -> adopts 1's label.
    // after round 1: 1<->2 swap (each other's only same-weight... ) keep
    // the assertion to the argmax property itself on a star.
    val c1 = communities(Seq((1L, 3L, 2L), (2L, 3L, 1L)), iters = 1)
    assert(c1(3L) === 1L)
    // exact tie: equal weights -> smallest neighbour label
    val c2 = communities(Seq((1L, 3L, 2L), (2L, 3L, 2L)), iters = 1)
    assert(c2(3L) === 1L)
  }

  test("parallel and reverse edges collapse by summed weight") {
    // 2->3 twice (w=2 total) outweighs 1->3 (w=1 once, even duplicated
    // in reverse orientation it stays w=2 vs w=2... make it decisive)
    val c = communities(
      Seq((2L, 3L, 2L), (3L, 2L, 3L), (1L, 3L, 4L)), iters = 1)
    assert(c(3L) === 2L) // 2's summed weight 5 beats 1's 4
  }

  test("self-loops and non-positive weights are ignored") {
    val c = communities(
      Seq((1L, 1L, 9L), (1L, 2L, 1L), (2L, 3L, 0L)), iters = 1)
    assert(c.keySet === Set(1L, 2L))
  }
}
