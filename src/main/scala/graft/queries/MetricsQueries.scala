package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import graft.metrics.Metrics
import graft.split.Splits
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for metrics + splitting (SURVEY §2.4 A16-A19,
  * §2.8 M6). Labels/predictions are derived deterministically from
  * lineitem so the whole evaluation pipeline is SQL-expressible:
  * label = [l_returnflag = 'R'], pred = [l_discount >= 0.05].
  */
object MetricsQueries extends QueryPack {

  private def labeled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      when(col("l_returnflag") === "R", 1).otherwise(0).as("label"),
      when(col("l_discount") >= 0.05, 1).otherwise(0).as("pred"),
      col("l_discount").as("score"))

  private val labeledSql =
    """SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
              CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS pred,
              l_discount AS score
       FROM lineitem"""

  val accuracy: GraftQuery = GraftQuery(
    "accuracy_synth",
    (s, dir) => Metrics.accuracy(labeled(s, dir), "label", "pred"),
    Some(s"""
      SELECT round(AVG(CASE WHEN label = pred THEN 1.0 ELSE 0.0 END), 6) AS accuracy
      FROM ($labeledSql)"""))

  val confusion: GraftQuery = GraftQuery(
    "confusion_matrix_synth",
    (s, dir) => Metrics.confusion(labeled(s, dir), "label", "pred"),
    Some(s"""
      SELECT label, pred, COUNT(*) AS n FROM ($labeledSql)
      GROUP BY label, pred ORDER BY label, pred"""))

  private val perClassSql = s"""
      WITH d AS ($labeledSql),
      cls AS (SELECT DISTINCT label AS cls FROM d
              UNION SELECT DISTINCT pred FROM d),
      bl AS (SELECT label, COUNT(*) AS support FROM d GROUP BY label),
      bp AS (SELECT pred, COUNT(*) AS n_pred FROM d GROUP BY pred),
      dg AS (SELECT label, COUNT(*) AS tp FROM d WHERE label = pred GROUP BY label),
      per AS (
        SELECT cls.cls,
               CAST(COALESCE(bl.support, 0) AS BIGINT) AS support,
               CAST(COALESCE(bp.n_pred, 0) AS BIGINT) AS n_pred,
               CAST(COALESCE(dg.tp, 0) AS BIGINT) AS tp
        FROM cls LEFT JOIN bl ON bl.label = cls.cls
                 LEFT JOIN bp ON bp.pred = cls.cls
                 LEFT JOIN dg ON dg.label = cls.cls),
      prf AS (
        SELECT cls, support, n_pred, tp,
               CASE WHEN n_pred > 0 THEN tp * 1.0 / n_pred ELSE 0.0 END AS "precision",
               CASE WHEN support > 0 THEN tp * 1.0 / support ELSE 0.0 END AS recall
        FROM per),
      prf2 AS (
        SELECT *, CASE WHEN "precision" + recall > 0
                       THEN 2 * "precision" * recall / ("precision" + recall)
                       ELSE 0.0 END AS f1
        FROM prf)"""

  val perClass: GraftQuery = GraftQuery(
    "per_class_prf_synth",
    (s, dir) => Metrics.perClass(labeled(s, dir), "label", "pred")
      .select(col("cls"), col("support"), col("n_pred"), col("tp"),
        Q.r6(col("precision")).as("precision"),
        Q.r6(col("recall")).as("recall"),
        Q.r6(col("f1")).as("f1"))
      .orderBy("cls"),
    Some(s"""$perClassSql
      SELECT cls, support, n_pred, tp, round("precision", 6) AS "precision",
             round(recall, 6) AS recall, round(f1, 6) AS f1
      FROM prf2 ORDER BY cls"""))

  val macroF1: GraftQuery = GraftQuery(
    "macro_f1_synth",
    (s, dir) => Metrics.macroAvg(labeled(s, dir), "label", "pred"),
    Some(s"""$perClassSql
      SELECT round(AVG("precision"), 6) AS macro_precision,
             round(AVG(recall), 6) AS macro_recall,
             round(AVG(f1), 6) AS macro_f1
      FROM prf2"""))

  val weighted: GraftQuery = GraftQuery(
    "weighted_prf_synth",
    (s, dir) => Metrics.weightedAvg(labeled(s, dir), "label", "pred"),
    Some(s"""$perClassSql
      SELECT round(SUM("precision" * support) / SUM(support), 6) AS weighted_precision,
             round(SUM(recall * support) / SUM(support), 6) AS weighted_recall,
             round(SUM(f1 * support) / SUM(support), 6) AS weighted_f1
      FROM prf2"""))

  val rocAuc: GraftQuery = GraftQuery(
    "roc_auc_synth",
    (s, dir) => Metrics.rocAuc(labeled(s, dir), "score", "label"),
    Some(s"""
      WITH d AS ($labeledSql),
      g AS (SELECT round(score, 6) AS score,
                   SUM(label) AS np, COUNT(*) - SUM(label) AS nn
            FROM d GROUP BY round(score, 6)),
      c AS (SELECT np, nn,
                   COALESCE(SUM(nn) OVER (ORDER BY score
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
            FROM g)
      SELECT round(SUM(np * (cumnn + nn / 2.0)) / (SUM(np) * SUM(nn)), 6) AS auc
      FROM c"""))

  /** Reliability diagram + per-bin Brier over a deterministic synthetic
    * score ([[Metrics.calibrationBins]]): score millis = price cents mod
    * 1000 (a uniform-ish [0,1) score), label = returned flag. The
    * calibration gate every trained scorer feeds before its threshold
    * is chosen; all bin math is exact integers so the 10-row curve
    * hash-replays.
    */
  val calibration: GraftQuery = GraftQuery(
    "calibration_curve_synth",
    (s, dir) => Metrics.calibrationBins(
      Tables(s, dir, "lineitem"),
      Q.cents("l_extendedprice") % 1000,
      when(col("l_returnflag") === "R", 1).otherwise(0)),
    Some("""
      WITH d AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) % 1000 AS m,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem),
      g AS (
        SELECT m // 100 AS bin, COUNT(*) AS n,
               CAST(SUM(m) AS BIGINT) AS sm,
               CAST(SUM(y) AS BIGINT) AS ny,
               CAST(SUM((m - 1000 * y) * (m - 1000 * y)) AS BIGINT) AS ssq
        FROM d GROUP BY m // 100)
      SELECT bin, n, round(sm / 1000.0 / n, 6) AS mean_score,
             round(ny * 1.0 / n, 6) AS frac_pos,
             round(ssq / 1000000.0 / n, 6) AS brier
      FROM g ORDER BY bin"""))

  val hashFold: GraftQuery = GraftQuery(
    "hash_fold_counts",
    (s, dir) => Splits.hashFold(Tables(s, dir, "lineitem"), "l_orderkey", 5)
      .groupBy("fold").agg(count(lit(1)).as("n")).orderBy("fold"),
    Some("""
      SELECT CAST(l_orderkey % 5 AS INTEGER) AS fold, COUNT(*) AS n
      FROM lineitem GROUP BY fold ORDER BY fold"""))

  /** Stratified split: per-class sizes are exactly ceil(frac*n) regardless
    * of the seed, so the count query IS oracle-expressible even though the
    * row assignment is seeded randomness.
    */
  val stratified: GraftQuery = GraftQuery(
    "stratified_split_counts",
    (s, dir) => Splits
      .stratifiedSplit(Tables(s, dir, "lineitem"), "l_returnflag", 0.8, 42)
      .groupBy(col("l_returnflag").as("label"), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "split"),
    Some("""
      WITH c AS (SELECT l_returnflag AS label, COUNT(*) AS n
                 FROM lineitem GROUP BY l_returnflag)
      SELECT label, CAST(0 AS INTEGER) AS split,
             CAST(ceil(n * 0.8) AS BIGINT) AS n FROM c
      UNION ALL
      SELECT label, CAST(1 AS INTEGER) AS split,
             n - CAST(ceil(n * 0.8) AS BIGINT) AS n FROM c
      ORDER BY label, split"""))

  /** PR curve + step-wise average precision over the same synthetic
    * scored frame as `roc_auc_synth` — per-threshold terms round to
    * integer micro-units before the (integer, order-independent) total.
    */
  val prCurve: GraftQuery = GraftQuery(
    "pr_curve_synth",
    (s, dir) => Metrics.prCurve(labeled(s, dir), "score", "label"),
    Some(s"""
      WITH d AS ($labeledSql),
      g AS (SELECT round(score, 6) AS score,
                   CAST(SUM(label) AS BIGINT) AS np,
                   CAST(COUNT(*) - SUM(label) AS BIGINT) AS nn
            FROM d GROUP BY round(score, 6)),
      c AS (SELECT score, np,
                   SUM(np) OVER (ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
                   SUM(nn) OVER (ORDER BY score DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp,
                   SUM(np) OVER () AS tp
            FROM g),
      t AS (SELECT score, np AS n_pos,
                   CAST(ctp AS BIGINT) AS cum_tp, CAST(cfp AS BIGINT) AS cum_fp,
                   round(ctp * 1.0 / (ctp + cfp), 6) AS "precision",
                   round(ctp * 1.0 / tp, 6) AS recall,
                   CAST(floor(np * 1.0 / tp * (ctp * 1.0 / (ctp + cfp))
                     * 1000000 + 0.5) AS BIGINT) AS term_micro
            FROM c)
      SELECT score, n_pos, cum_tp, cum_fp, "precision", recall, term_micro,
             CAST(SUM(term_micro) OVER () AS BIGINT) AS ap_micro
      FROM t ORDER BY score DESC"""))

  /** Decile gains/lift table on the order frame: orders ranked by
    * totalprice cents (orderkey tiebreak), label = fully-shipped status.
    */
  val liftDeciles: GraftQuery = GraftQuery(
    "lift_gains_deciles",
    (s, dir) => Metrics.liftDeciles(
      Tables(s, dir, "orders"),
      Q.cents("o_totalprice"),
      when(col("o_orderstatus") === "F", 1).otherwise(0),
      col("o_orderkey")),
    Some("""
      WITH d AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
               o_orderkey AS id
        FROM orders),
      w AS (SELECT y, row_number() OVER (ORDER BY s DESC, id) AS rn,
                   COUNT(*) OVER () AS nr, SUM(y) OVER () AS tp
            FROM d),
      g AS (SELECT (rn - 1) * 10 // nr AS decile, COUNT(*) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   MAX(nr) AS nr, CAST(MAX(tp) AS BIGINT) AS tp
            FROM w GROUP BY 1)
      SELECT decile, n, n_pos,
             round(n_pos * 1.0 / n, 6) AS pos_rate,
             round(SUM(n_pos) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1.0 / tp, 6) AS cum_capture,
             round((n_pos * 1.0 / n) / (tp * 1.0 / nr), 6) AS lift
      FROM g ORDER BY decile"""))

  override def queries: Seq[GraftQuery] = Seq(
    accuracy, confusion, perClass, macroF1, weighted, rocAuc, calibration,
    hashFold, stratified, prCurve, liftDeciles)
}
