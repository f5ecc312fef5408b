package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import graft.tree.{DecisionTree, TreeParams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decision-tree queries (SURVEY §2.8 M8/M9, §2.4 A11-A14, A20).
  *
  * The trainer's core aggregation — the per-threshold information-gain
  * table — is oracle-checked against DuckDB SQL that replicates the
  * cumulative-histogram computation step by step. Full tree training is
  * not SQL-expressible, so the end-to-end queries are rows-only there,
  * with exact semantics covered by unit goldens.
  */
object TreeQueries extends QueryPack {

  private def labeled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      col("l_quantity"), col("l_discount"), col("l_tax"),
      col("l_extendedprice"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("label"))

  /** A14: the info-gain split-search table for one feature at the root —
    * the heart of the trainer, fully oracle-checked.
    */
  val splitGains: GraftQuery = GraftQuery(
    "split_gains_discount",
    (s, dir) => DecisionTree.rootGains(
        labeled(s, dir), "l_discount", "label", Seq(0L, 1L),
        criterion = "entropy", minSamplesLeaf = 1)
      .select(col("threshold"), col("ln"), col("tn"), Q.r6(col("gain")).as("gain"))
      .orderBy("threshold"),
    Some("""
      WITH d AS (
        SELECT CAST(l_discount AS DOUBLE) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
      g AS (SELECT v, COUNT(*) AS n,
                   SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS c0,
                   SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS c1
            FROM d GROUP BY v),
      c AS (SELECT v,
                   SUM(n)  OVER wc AS ln,  SUM(n)  OVER wa AS tn,
                   SUM(c0) OVER wc AS lc0, SUM(c0) OVER wa AS tc0,
                   SUM(c1) OVER wc AS lc1, SUM(c1) OVER wa AS tc1
            FROM g
            WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wa AS ())
      SELECT v AS threshold, CAST(ln AS BIGINT) AS ln, CAST(tn AS BIGINT) AS tn,
             round(
               (-(CASE WHEN tc0 > 0 THEN (tc0/tn)*log2(tc0/tn) ELSE 0.0 END
                  + CASE WHEN tc1 > 0 THEN (tc1/tn)*log2(tc1/tn) ELSE 0.0 END))
               - (ln/tn) * (-(CASE WHEN lc0 > 0 THEN (lc0/ln)*log2(lc0/ln) ELSE 0.0 END
                              + CASE WHEN lc1 > 0 THEN (lc1/ln)*log2(lc1/ln) ELSE 0.0 END))
               - ((tn-ln)/tn) * (-(CASE WHEN tc0-lc0 > 0 THEN ((tc0-lc0)/(tn-ln))*log2((tc0-lc0)/(tn-ln)) ELSE 0.0 END
                                   + CASE WHEN tc1-lc1 > 0 THEN ((tc1-lc1)/(tn-ln))*log2((tc1-lc1)/(tn-ln)) ELSE 0.0 END)),
               6) AS gain
      FROM c
      WHERE ln >= 1 AND tn - ln >= 1
        AND v > (SELECT MIN(v) FROM d) -- reference skips unique_values[0]
      ORDER BY threshold"""))

  private val feats =
    Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")
  private val params =
    TreeParams(maxDepth = 3, minSamplesSplit = 50, minSamplesLeaf = 20)

  // memoized per (sfDir, binned): importance reuses the confusion query's
  // model instead of retraining the identical tree
  private val modelCache =
    scala.collection.concurrent.TrieMap[(String, Boolean), graft.tree.TreeModel]()
  private def model(s: SparkSession, dir: String, binned: Boolean) =
    modelCache.getOrElseUpdate((dir, binned), DecisionTree.fit(
      labeled(s, dir), feats, "label",
      if (binned) params.copy(maxBins = Some(16)) else params))

  /** M8+M9 end-to-end: depth-3 exact-mode tree, evaluated via confusion
    * counts (deterministic; rows-only — training is not SQL).
    */
  val trainConfusion: GraftQuery = GraftQuery(
    "tree_train_confusion",
    (s, dir) => {
      val d = labeled(s, dir)
      model(s, dir, binned = false).transform(d, "pred")
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    },
    None)

  /** A20: split-count feature importance of the same tree — rows-only. */
  val importance: GraftQuery = GraftQuery(
    "tree_feature_importance",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      model(s, dir, binned = false).importance
        .toDF("feature", "importance").orderBy("feature")
    },
    None)

  /** Scalable mode: same tree with maxBins=16 quantized candidates. */
  val trainBinned: GraftQuery = GraftQuery(
    "tree_train_binned_confusion",
    (s, dir) => {
      val d = labeled(s, dir)
      model(s, dir, binned = true).transform(d, "pred")
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
    },
    None)

  /** M9+A19: ROC-AUC over the tree's positive-class leaf probabilities
    * (probaExpr) — rows-only (training is not SQL); deterministic given
    * the deterministic trainer.
    */
  val probaAuc: GraftQuery = GraftQuery(
    "tree_proba_auc",
    (s, dir) => {
      val d = labeled(s, dir)
      graft.metrics.Metrics.rocAuc(
        d.withColumn("score", model(s, dir, binned = false).probaOf(1L)),
        "score", "label")
    },
    None)

  /** Per-sample decision paths (house_predict_model.ipynb cell 14),
    * aggregated to (path, n) — rows-only, deterministic.
    */
  val pathCounts: GraftQuery = GraftQuery(
    "tree_path_counts",
    (s, dir) => {
      val d = labeled(s, dir)
      d.withColumn("path", model(s, dir, binned = false).pathExpr)
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy("path")
    },
    None)

  override def queries: Seq[GraftQuery] = Seq(
    splitGains, trainConfusion, importance, trainBinned, probaAuc,
    pathCounts)
}
