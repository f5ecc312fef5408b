package graft.graph

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRankMicro(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map { case Row(id: Long, r: Long) => id -> r }.toMap

  test("two-node chain matches hand-computed fixed-point arithmetic") {
    // 1 -> 2. iter1: r1 = 150000; r2 = 150000 + 85*1000000 div 100 = 1000000
    // iter2: r1 = 150000; r2 = 150000 + 85*150000 div 100 = 277500
    val r = ranks(Seq((1L, 2L)), 2)
    assert(r === Map(1L -> 150000L, 2L -> 277500L))
  }

  test("star graph concentrates rank on the hub") {
    val edges = (2L to 6L).map(i => (i, 1L))
    val r = ranks(edges, 5)
    assert(r(1L) > r(2L) * 3)
    assert((2L to 6L).map(r).toSet.size === 1) // leaves identical by symmetry
  }

  test("self-loops and duplicate edges are ignored") {
    val r1 = ranks(Seq((1L, 2L), (2L, 1L)), 3)
    val r2 = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L)), 3)
    assert(r1 === r2)
    // symmetric 2-cycle: both nodes keep identical rank
    assert(r1(1L) === r1(2L))
  }

  test("weighted: all mass to one edge matches the unweighted 2-chain") {
    import org.apache.spark.sql.functions.col
    // node 1 sends 99% of its weight to 2, 1% to 3
    val e = Seq((1L, 2L, 99L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = PageRank.pageRankMicroWeighted(e, "src", "dst", "w", 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // contrib to 2: (1e6 * 99) div 100 = 990000; r2 = 150000 + 85%*990000
    assert(r(2L) === 150000L + 85L * 990000L / 100L)
    assert(r(3L) === 150000L + 85L * 10000L / 100L)
    // equal weights reduce to the unweighted split
    val eq = Seq((1L, 2L, 7L), (1L, 3L, 7L)).toDF("src", "dst", "w")
    val rw = PageRank.pageRankMicroWeighted(eq, "src", "dst", "w", 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val ru = PageRank.pageRankMicro(
      Seq((1L, 2L), (1L, 3L)).toDF("src", "dst"), "src", "dst", 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rw === ru)
    // parallel edges collapse by weight sum
    val par = Seq((1L, 2L, 50L), (1L, 2L, 49L), (1L, 3L, 1L))
      .toDF("src", "dst", "w")
    val rp = PageRank.pageRankMicroWeighted(par, "src", "dst", "w", 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rp === r)
  }

  test("deterministic across repartitionings") {
    val edges = for (i <- 1L to 40L) yield (i, i % 7 + 1L)
    val df = edges.toDF("src", "dst")
    val a = PageRank.pageRankMicro(df.repartition(13), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.pageRankMicro(df.coalesce(1), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
