package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Embedding similarity-search queries. Brute-force cosine is
  * oracle-checked (unnest/subscript SQL); the LSH ANN path is rows-only
  * (seeded hyperplanes are engine-internal).
  */
object SimQueries extends QueryPack {

  private val cosineTopSql = """
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      qv AS (SELECT generate_subscripts(qe, 1) AS pos,
                    CAST(unnest(qe) AS DOUBLE) AS v FROM q),
      dv AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                    CAST(unnest(embedding) AS DOUBLE) AS v
             FROM embeddings WHERE vec_id <> 0),
      agg AS (SELECT dv.vec_id, SUM(dv.v * qv.v) AS dot,
                     SUM(dv.v * dv.v) AS nd
              FROM dv JOIN qv USING (pos) GROUP BY dv.vec_id),
      nq AS (SELECT SUM(v * v) AS nq FROM qv),
      top AS (SELECT vec_id, round(dot / (sqrt(nd) * sqrt(nq)), 6) AS cos
              FROM agg, nq
              ORDER BY cos DESC, vec_id LIMIT 10)"""

  val cosineTopK: GraftQuery = GraftQuery(
    "cosine_topk_vec0",
    (s, dir) => Similarity.cosineTopK(
      Tables(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10),
    Some(s"$cosineTopSql SELECT vec_id, cos FROM top"))

  /** kNN classification: majority label among the exact top-10. */
  val knnVote: GraftQuery = GraftQuery(
    "knn_label_vote_vec0",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
        .join(emb.select("vec_id", "label"), Seq("vec_id"))
        .groupBy("label").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("label"))
        .limit(1)
    },
    Some(s"""$cosineTopSql
      SELECT label, COUNT(*) AS n
      FROM top JOIN embeddings USING (vec_id)
      GROUP BY label ORDER BY n DESC, label LIMIT 1"""))

  /** Embedding-cosine near-dup pairs (brute-force oracle baseline). */
  val nearDup: GraftQuery = GraftQuery(
    "embedding_near_dup_pairs",
    (s, dir) => Similarity.nearDupPairs(
      Tables(s, dir, "embeddings"), "vec_id", "embedding", 0.4),
    Some("""
      WITH v AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                        CAST(unnest(embedding) AS DOUBLE) AS x
                 FROM embeddings),
      n AS (SELECT vec_id, SUM(x * x) AS nr FROM v GROUP BY vec_id),
      d AS (SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(a.x * b.x) AS dot
            FROM v a JOIN v b ON a.pos = b.pos AND a.vec_id < b.vec_id
            GROUP BY ia, ib),
      c AS (SELECT ia AS id_a, ib AS id_b,
                   round(dot / (sqrt(na.nr) * sqrt(nb.nr)), 6) AS cos
            FROM d JOIN n na ON na.vec_id = ia JOIN n nb ON nb.vec_id = ib)
      SELECT id_a, id_b, cos FROM c WHERE cos >= 0.4
      ORDER BY id_a, id_b"""))

  /** LSH-bucketed ANN — the 100-TB path: each query scores one bucket. */
  val annTopK: GraftQuery = GraftQuery(
    "ann_lsh_topk_vec0",
    (s, dir) => Similarity.annTopK(
      Tables(s, dir, "embeddings"), "vec_id", "embedding", 0L, 10,
      nPlanes = 4),
    None)

  /** IVF ANN: k-means coarse quantizer, 2-of-8 lists probed. */
  val ivfTopK: GraftQuery = GraftQuery(
    "ivf_ann_topk_vec0",
    (s, dir) => {
      val idx = Similarity.ivfFit(
        Tables(s, dir, "embeddings"), "vec_id", "embedding", nLists = 8)
      Similarity.ivfTopK(idx, 0L, 10, nProbe = 2)
    },
    None)

  override def queries: Seq[GraftQuery] =
    Seq(cosineTopK, knnVote, nearDup, annTopK, ivfTopK)
}
