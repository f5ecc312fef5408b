package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BfsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def hops(edges: Seq[(Long, Long)], rounds: Int = 6): Map[Long, Int] =
    Bfs.hopsFromMin(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("path graph: hops count edges from the minimum vertex") {
    val path = (1L to 5L).sliding(2).map(p => (p(0), p(1))).toSeq
    assert(hops(path) === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("edges are undirected; disconnected vertices are absent") {
    // 2 -> 1 still reaches 2 from source 1; the 8-9 island is unreached
    assert(hops(Seq((2L, 1L), (2L, 3L), (8L, 9L))) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("shortest of multiple routes wins") {
    // 1-2-3-4 chain plus shortcut 1-4
    assert(hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) ===
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("converged extra rounds are no-ops (fixpoint inside the unroll)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(hops(edges, rounds = 3) === hops(edges, rounds = 6))
  }
}
