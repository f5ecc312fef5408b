package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with degree-ordered edge orientation
  * (Suri & Vassilvitskii, "Counting triangles and the curse of the last
  * reducer", WWW 2011): orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher one, enumerate wedges from
  * each vertex's out-neighbors, and close them with a join back to the
  * oriented edge set. Orientation bounds each vertex's out-degree by
  * O(sqrt(m)), so the wedge join never explodes on skewed hubs — the
  * property that matters at 100 TB, where a naive a<b orientation puts
  * every hub wedge in one reducer.
  *
  * Entirely deterministic relational plan (two self-joins + aggregation),
  * so it replays verbatim in SQL.
  */
object Triangles {

  /** Canonical undirected edge set: (a, b) with a < b, loops dropped. */
  private def undirected(edges: DataFrame, src: String, dst: String): DataFrame =
    edges
      .select(
        least(col(src), col(dst)).cast("long").as("a"),
        greatest(col(src), col(dst)).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()

  /** Per-vertex triangle membership counts: (id, n_triangles), one row
    * per vertex appearing in at least one triangle.
    */
  def perVertexTriangles(
      edges: DataFrame, src: String, dst: String): DataFrame = {
    val und = undirected(edges, src, dst).localCheckpoint()
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u -> v iff (deg_u, u) < (deg_v, v)
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    // wedges (u; v, w) over u's out-neighbors, v before w in the same
    // total order used for orientation — i.e. the closing edge, if the
    // triangle exists, is oriented v -> w
    val ww = oriented.select(col("u"), col("v").as("w"))
    val wedges = oriented
      .join(ww, Seq("u"))
      .filter(col("v") =!= col("w"))
    val closed = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"), "left_semi")
    closed
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** The SQL replay for `perVertexTriangles`, given a CTE
    * `raw(src, dst)`; exposes `pvt(id, n_triangles)`.
    */
  def oracleCtes: String =
    """und AS MATERIALIZED (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM raw WHERE src <> dst),
      dg AS MATERIALIZED (
        SELECT id, COUNT(*) AS deg
        FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und)
        GROUP BY id),
      ori AS MATERIALIZED (
        SELECT CASE WHEN (da.deg, u0.a) < (db.deg, u0.b)
                    THEN u0.a ELSE u0.b END AS u,
               CASE WHEN (da.deg, u0.a) < (db.deg, u0.b)
                    THEN u0.b ELSE u0.a END AS v
        FROM und u0
        JOIN dg da ON da.id = u0.a
        JOIN dg db ON db.id = u0.b),
      tri AS (
        SELECT e1.u, e1.v, e2.v AS w
        FROM ori e1
        JOIN ori e2 ON e2.u = e1.u AND e2.v <> e1.v
        WHERE EXISTS (SELECT 1 FROM ori e3
                      WHERE e3.u = e1.v AND e3.v = e2.v)),
      pvt AS (
        SELECT id, COUNT(*) AS n_triangles
        FROM (SELECT u AS id FROM tri
              UNION ALL SELECT v FROM tri
              UNION ALL SELECT w FROM tri)
        GROUP BY id)"""
}
