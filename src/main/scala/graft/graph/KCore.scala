package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction: the maximal subgraph in which every vertex has
  * undirected degree >= k, computed by iterative peeling — each round
  * drops vertices below k and the edges touching them (Matula & Beck
  * 1983). A fixed peel count keeps the computation replayable as an
  * unrolled SQL CTE chain; KCoreSpec pins that the harness graphs reach
  * the fixpoint well inside the default 12 rounds (extra rounds are
  * no-ops once converged, in both engines identically).
  *
  * Each peel is a degree aggregation plus two semi joins — all key
  * shuffles on the (already distilled) edge list, with the shrinking
  * edge frame checkpointed per round so lineage stays O(1).
  */
object KCore {

  val DefaultPeels = 12

  /** Surviving vertices of the k-core with their in-core degree:
    * (id, deg), deg >= k once converged.
    */
  def kCoreVertices(
      edges: DataFrame, src: String, dst: String, k: Int,
      peels: Int = DefaultPeels): DataFrame = {
    var alive = edges
      .select(
        least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    // Early exit at the fixpoint (r16): peeling only ever SHRINKS the
    // edge set, so an unchanged edge count means an unchanged edge set
    // and every remaining round is a no-op — identical result, fewer
    // full passes (the oracle unrolls all rounds; extra rounds are
    // idempotent there too). The count reads the just-checkpointed
    // blocks, not the lineage.
    var prevEdges = alive.count()
    var converged = false
    for (_ <- 1 to peels if !converged) {
      val deg = alive.select(col("a").as("id"))
        .union(alive.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("id")
      alive = alive
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      val n = alive.count()
      if (n == prevEdges) converged = true else prevEdges = n
    }
    alive.select(col("a").as("id"))
      .union(alive.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
  }

  /** Unrolled SQL replay, given `raw(src, dst)` in scope; exposes
    * `core(id, deg)`.
    */
  def oracleCtes(k: Int, peels: Int = DefaultPeels): String = {
    val head =
      """a0 AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM raw WHERE src <> dst)"""
    val steps = (1 to peels).map { i =>
      s"""k$i AS (SELECT id FROM (
            SELECT id, COUNT(*) AS deg
            FROM (SELECT a AS id FROM a${i - 1}
                  UNION ALL SELECT b FROM a${i - 1})
            GROUP BY id) WHERE deg >= $k),
      a$i AS MATERIALIZED (
        SELECT e.a, e.b FROM a${i - 1} e
        WHERE EXISTS (SELECT 1 FROM k$i x WHERE x.id = e.a)
          AND EXISTS (SELECT 1 FROM k$i y WHERE y.id = e.b))"""
    }
    val core =
      s"""core AS (SELECT id, COUNT(*) AS deg
           FROM (SELECT a AS id FROM a$peels UNION ALL SELECT b FROM a$peels)
           GROUP BY id)"""
    (head +: steps :+ core).mkString(",\n      ")
  }
}
