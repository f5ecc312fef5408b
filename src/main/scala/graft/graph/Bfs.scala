package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Breadth-first hop counts from the minimum-id vertex, by unrolled
  * frontier relaxation: `h_{i+1}(v) = min(h_i(v), 1 + min over in-edges
  * h_i(u))` — each round one join + min-aggregation over the (tiny next
  * to the fact scan) reached set, checkpointed so lineage stays O(1).
  * A fixed unroll replays as a SQL CTE chain; converged extra rounds
  * are no-ops, so any unroll >= the graph's eccentricity is exact
  * (BfsSpec pins convergence on the harness graphs). Unreached
  * vertices are absent from the output.
  */
object Bfs {

  val DefaultRounds = 6

  /** (id, hop) for every vertex reachable from the minimum vertex id,
    * treating edges as undirected.
    */
  def hopsFromMin(
      edges: DataFrame, src: String, dst: String,
      rounds: Int = DefaultRounds): DataFrame = {
    val dir0 = edges.select(
      col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    val e = dir0
      .union(dir0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    val source = e.agg(min(least(col("src"), col("dst"))).as("id"))
      .select(col("id"), lit(0).cast("int").as("hop"))
    var reached = source.localCheckpoint()
    for (_ <- 1 to rounds) {
      reached = reached
        .unionByName(reached
          .join(e, reached("id") === e("src"))
          .select(col("dst").as("id"), (col("hop") + 1).as("hop")))
        .groupBy("id").agg(min("hop").as("hop"))
        .localCheckpoint()
    }
    reached
  }

  /** SQL replay, given `e(src, dst)` (directed, deduped, no loops) in
    * scope; symmetrizes internally and exposes `b{rounds}(id, hop)`.
    */
  def oracleCtes(rounds: Int = DefaultRounds): String = {
    val head =
      """u AS MATERIALIZED (
        SELECT src, dst FROM e
        UNION SELECT dst, src FROM e),
      b0 AS (SELECT (SELECT MIN(LEAST(src, dst)) FROM u) AS id, 0 AS hop)"""
    val steps = (1 to rounds).map { i =>
      s"""b$i AS (SELECT id, MIN(hop) AS hop FROM (
          SELECT id, hop FROM b${i - 1}
          UNION ALL
          SELECT u.dst AS id, b${i - 1}.hop + 1 AS hop
          FROM b${i - 1} JOIN u ON u.src = b${i - 1}.id)
        GROUP BY id)"""
    }
    (head +: steps).mkString(",\n      ")
  }
}
