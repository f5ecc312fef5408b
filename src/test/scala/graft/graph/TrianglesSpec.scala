package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TrianglesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perVertexTriangles(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one triangle counts once per member") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 1L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4 has four triangles, three per vertex") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a path has no triangles; vertices without triangles are absent") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
  }

  test("direction, duplicates, and loops are irrelevant") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L),
      (3L, 1L), (1L, 2L))
    assert(counts(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub graph: triangles only where wedges close") {
    // star 1-{2,3,4,5} plus edge 2-3: exactly one triangle (1,2,3)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 3L))
    assert(counts(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
