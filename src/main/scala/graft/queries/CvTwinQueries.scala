package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.tree.{DecisionTree, TreeParams}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic k-fold × grid cross-validation, FULLY oracle-checked —
  * the CV-selection shape (fold routing -> per-config per-fold training
  * -> validation metric -> mean-per-config -> argmax config; reference
  * M11's concept, Sol_2.ipynb cell 9) made hash-replayable. MLlib's
  * CrossValidator shuffles folds and seeds each fit from internal RNG
  * streams no SQL engine can replay, so the seeded-MLlib gate
  * (`cv_random_search`) stays rows-only by design — THIS query is its
  * oracle-green twin, the CV counterpart of `rf_bagged_vote_confusion`.
  *
  * Determinism swap: folds are a seeded cross-engine 60-bit md5 hash of
  * the order key mod 3 (the engine's own `Splits.hashFold` scheme), and
  * every (config, fold) fit is the exact level-wise trainer already
  * DuckDB-replayed by the tree family. The grid varies maxDepth {1, 2} — two
  * genuinely different models, so selection is decided by the data, not
  * degenerate. The task is a PLANTED two-level interaction —
  * y = (l_tax >= 0.05) where quantity <= 25, else (l_discount <= 0.03)
  * — the standard device for validating model-selection mechanics when
  * no natural label exists (the harness's synthetic columns are
  * mutually independent, so any natural label collapses every config to
  * the majority predictor and selection degenerates to the tie-break;
  * measured: corr(quantity, price-band) = 0.003). Depth 1 can cut only
  * one arm of the interaction; depth 2 expresses it, so the grid's two
  * configs earn genuinely different macro-F1 and the argmax is earned,
  * not tie-broken. l_linenumber rides along as a pure-noise feature the
  * gain search must reject. The validation metric is macro-F1 with
  * zero_division=0 (task_2.md:24 semantics), computed from integer
  * confusion counts in the single-division form 2·TP/(2·TP+FP+FN) and
  * micro-rounded per (config, fold), so config means are integer sums —
  * the whole output frame is BIGINT and accumulation-order independent.
  *
  * Scale shape: 6 level-wise fits (grouped gain tables bounded by
  * node×feature×distinct-value — rows never leave the cluster) + 6
  * validation-slice aggregations behind compiled when-chain inference;
  * the 6-row result frame is checkpointed and the winning config
  * attaches as a broadcast 1-row frame. Fits are memoized per sfDir
  * (the tree family's model-cache pattern).
  */
object CvTwinQueries extends QueryPack {

  private val nFolds = 3
  private val hashSeed = 13
  private val depths = Seq(1, 2)
  private def params(d: Int) = TreeParams(
    maxDepth = d, minSamplesSplit = 50, minSamplesLeaf = 20,
    criterion = "entropy")
  private val feats =
    Seq("l_quantity", "l_discount", "l_tax", "l_linenumber")

  private val modelCache = scala.collection.concurrent.TrieMap[
    (String, Int, Int), graft.tree.TreeModel]()
  private def model(
      s: SparkSession, dir: String, d: DataFrame,
      depth: Int, fold: Int): graft.tree.TreeModel =
    modelCache.getOrElseUpdate((dir, depth, fold),
      DecisionTree.fit(d.filter(col("h") =!= fold), feats, "label",
        params(depth)))

  private def withFold(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      (feats.map(col) :+
        when(col("l_quantity") <= 25,
          when(col("l_tax") >= 0.05, 1L).otherwise(0L))
          .otherwise(when(col("l_discount") <= 0.03, 1L).otherwise(0L))
          .as("label") :+
        (graft.dedup.Dedup.md5Hash60(col("l_orderkey").cast("string"),
          hashSeed).cast("long") % nFolds).as("h")): _*)

  /** Macro-F1 in micro-units from binary confusion counts; the class-0
    * term reads the class-1 counts mirrored (tp0=tn, fp0=fn1, fn0=fp1).
    * Spelled operand-for-operand like the oracle SQL below.
    */
  private def macroF1Micro(
      tp1: Column, fp1: Column, fn1: Column, tn: Column): Column = {
    val f1c0 = when(tn * 2 + fn1 + fp1 > 0,
      (lit(2.0) * tn) / (tn * 2 + fn1 + fp1)).otherwise(0.0)
    val f1c1 = when(tp1 * 2 + fp1 + fn1 > 0,
      (lit(2.0) * tp1) / (tp1 * 2 + fp1 + fn1)).otherwise(0.0)
    floor(((f1c0 + f1c1) / 2.0) * 1e6 + 0.5).cast("long")
  }

  val cvGrid: GraftQuery = GraftQuery(
    "cv_grid_tree_select",
    (s, dir) => {
      val d = withFold(s, dir)
      val perRow = (for (dep <- depths; f <- 0 until nFolds) yield {
        val m = model(s, dir, d, dep, f)
        d.filter(col("h") === f)
          .select(col("label"), m.predictExpr.as("pred"))
          .agg(
            count(lit(1)).as("n_val"),
            sum(when(col("label") === 1 && col("pred") === 1, 1L)
              .otherwise(0L)).as("tp1"),
            sum(when(col("label") === 0 && col("pred") === 1, 1L)
              .otherwise(0L)).as("fp1"),
            sum(when(col("label") === 1 && col("pred") === 0, 1L)
              .otherwise(0L)).as("fn1"),
            sum(when(col("label") === 0 && col("pred") === 0, 1L)
              .otherwise(0L)).as("tn"))
          .select(lit(dep).cast("long").as("max_depth"),
            lit(f).cast("long").as("fold"), col("n_val"),
            macroF1Micro(col("tp1"), col("fp1"), col("fn1"), col("tn"))
              .as("macro_f1_micro"))
      }).reduce(_.unionByName(_))
        // 6 rows, each the product of a fit + a validation scan — pin
        // them so the config-sum window and the argmax attach below don't
        // re-run the 12 upstream jobs
        .localCheckpoint()
      val scored = perRow.withColumn("sum_f1_micro",
        sum("macro_f1_micro").over(Window.partitionBy("max_depth")))
      val best = scored
        .orderBy(desc("sum_f1_micro"), asc("max_depth"), asc("fold"))
        .limit(1).select(col("max_depth").as("best_depth"))
      scored.crossJoin(broadcast(best))
        .withColumn("selected",
          when(col("max_depth") === col("best_depth"), 1L).otherwise(0L))
        .orderBy("max_depth", "fold")
    },
    Some(oracleSql))

  // ---------------------------------------------------------------------
  // DuckDB replay: one level-wise training chain per (depth, fold) —
  // the tree family's proven CTE shape, suffixed `_{d}_{f}` — then the
  // held-out fold routed through that config's winner tables, confusion
  // counts, macro-F1 micro, config sums, and the argmax config.
  // Every feature here is LOW-CARDINALITY (quantity 50 x discount 11 x
  // tax 9 x linenumber 7 distinct values), and the planted label is a
  // function of the features, so base collapses exactly to weighted
  // (f-vector, y, fold) rows (~100k at any sf) — the TreeQueries r13
  // pre-aggregation move, which is what makes SIX data-sized trainer
  // chains replayable at the 600M-row rung (the per-row form died on
  // disk at 389 s).
  // ---------------------------------------------------------------------

  private def valByFord(row: String, w: String): String =
    s"(CASE $w.ford WHEN 0 THEN $row.f0 WHEN 1 THEN $row.f1" +
      s" WHEN 2 THEN $row.f2 ELSE $row.f3 END)"

  private def levelSql(l: Int, sfx: String): String = {
    val p = params(0) // depth-independent thresholds
    s"""
      sr${l}_$sfx AS MATERIALIZED (SELECT node FROM a${l}_$sfx GROUP BY node
               HAVING SUM(w) >= ${p.minSamplesSplit}
                  AND SUM(y*w) > 0 AND SUM(w) - SUM(y*w) > 0),
      aj${l}_$sfx AS MATERIALIZED (
        SELECT a.* FROM a${l}_$sfx a JOIN sr${l}_$sfx s ON a.node = s.node),
      m${l}_$sfx AS MATERIALIZED (
        SELECT node, 0 AS ford, f0 AS v, y, w FROM aj${l}_$sfx
        UNION ALL SELECT node, 1, f1, y, w FROM aj${l}_$sfx
        UNION ALL SELECT node, 2, f2, y, w FROM aj${l}_$sfx
        UNION ALL SELECT node, 3, f3, y, w FROM aj${l}_$sfx),
      g${l}_$sfx AS MATERIALIZED (SELECT node, ford, v,
                     CAST(SUM(w) AS BIGINT) AS n,
                     CAST(SUM(y*w) AS BIGINT) AS c1,
                     CAST(SUM(w) - SUM(y*w) AS BIGINT) AS c0
              FROM m${l}_$sfx GROUP BY node, ford, v),
      c${l}_$sfx AS MATERIALIZED (SELECT node, ford, v,
                     SUM(n)  OVER wc AS ln,  SUM(n)  OVER wa AS tn,
                     SUM(c0) OVER wc AS lc0, SUM(c0) OVER wa AS tc0,
                     SUM(c1) OVER wc AS lc1, SUM(c1) OVER wa AS tc1,
                     MIN(v)  OVER wa AS vmin
              FROM g${l}_$sfx
              WINDOW wc AS (PARTITION BY node, ford ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wa AS (PARTITION BY node, ford)),
      s${l}_$sfx AS MATERIALIZED (SELECT node, ford, v,
                     ${TreeQueries.gainSql} AS gain
              FROM c${l}_$sfx
              WHERE v > vmin AND ln >= ${p.minSamplesLeaf}
                AND tn - ln >= ${p.minSamplesLeaf}),
      b${l}_$sfx AS MATERIALIZED (SELECT node, ford, v AS thr
              FROM s${l}_$sfx WHERE gain > 0
              QUALIFY row_number() OVER (PARTITION BY node
                ORDER BY gain DESC, ford ASC, v ASC) = 1),
      a${l + 1}_$sfx AS MATERIALIZED (
        SELECT a.f0, a.f1, a.f2, a.f3, a.y, a.w,
               CASE WHEN win.node IS NULL THEN a.node
                    WHEN ${valByFord("a", "win")} <= win.thr THEN 2*a.node+1
                    ELSE 2*a.node+2 END AS node
        FROM a${l}_$sfx a LEFT JOIN b${l}_$sfx win ON a.node = win.node)"""
  }

  /** Training chain for config depth `d` on fold-complement `f`, then
    * the held-out fold routed level-by-level and confusion-counted.
    */
  private def configFoldSql(d: Int, f: Int): String = {
    val sfx = s"${d}_$f"
    val train = s"""
      a0_$sfx AS MATERIALIZED (
        SELECT f0, f1, f2, f3, y, w, 0 AS node FROM base WHERE h <> $f),
      ${(0 until d).map(levelSql(_, sfx)).mkString(",\n")},
      leaf_$sfx AS MATERIALIZED (SELECT node,
               CASE WHEN SUM(y*w) > SUM(w) - SUM(y*w) THEN 1 ELSE 0 END AS pred
              FROM a${d}_$sfx GROUP BY node)"""
    val route = (0 until d).map { l =>
      val from = if (l == 0) s"(SELECT * FROM base WHERE h = $f)"
                 else s"p${l}_$sfx"
      val prev = if (l == 0) "0" else s"p.n${l}_$sfx"
      s"""
      p${l + 1}_$sfx AS MATERIALIZED (
        SELECT p.*, CASE WHEN win.node IS NULL THEN $prev
                         WHEN ${valByFord("p", "win")} <= win.thr
                           THEN 2*($prev)+1
                         ELSE 2*($prev)+2 END AS n${l + 1}_$sfx
        FROM $from p LEFT JOIN b${l}_$sfx win ON win.node = $prev)"""
    }.mkString(",\n")
    s"""$train,
      $route,
      conf_$sfx AS MATERIALIZED (
        SELECT CAST(SUM(p.w) AS BIGINT) AS n_val,
               CAST(SUM(CASE WHEN p.y = 1 AND l.pred = 1 THEN p.w ELSE 0 END) AS BIGINT) AS tp1,
               CAST(SUM(CASE WHEN p.y = 0 AND l.pred = 1 THEN p.w ELSE 0 END) AS BIGINT) AS fp1,
               CAST(SUM(CASE WHEN p.y = 1 AND l.pred = 0 THEN p.w ELSE 0 END) AS BIGINT) AS fn1,
               CAST(SUM(CASE WHEN p.y = 0 AND l.pred = 0 THEN p.w ELSE 0 END) AS BIGINT) AS tn
        FROM p${d}_$sfx p JOIN leaf_$sfx l ON l.node = p.n${d}_$sfx)"""
  }

  private def rowSql(d: Int, f: Int): String = s"""
      SELECT CAST($d AS BIGINT) AS max_depth, CAST($f AS BIGINT) AS fold,
             CAST(n_val AS BIGINT) AS n_val,
             CAST(floor(((CASE WHEN tn * 2 + fn1 + fp1 > 0
                       THEN (2.0 * tn) / (tn * 2 + fn1 + fp1) ELSE 0.0 END
                     + CASE WHEN tp1 * 2 + fp1 + fn1 > 0
                       THEN (2.0 * tp1) / (tp1 * 2 + fp1 + fn1) ELSE 0.0 END)
                    / 2.0) * 1e6 + 0.5) AS BIGINT) AS macro_f1_micro
      FROM conf_${d}_$f"""

  private lazy val oracleSql: String = {
    val chains = (for (d <- depths; f <- 0 until nFolds)
      yield configFoldSql(d, f)).mkString(",\n")
    val rows = (for (d <- depths; f <- 0 until nFolds)
      yield rowSql(d, f)).mkString("\n      UNION ALL\n")
    s"""
      WITH base AS MATERIALIZED (
        SELECT f0, f1, f2, f3, y, h, COUNT(*) AS w
        FROM (
        SELECT CAST(l_quantity AS DOUBLE) AS f0,
               CAST(l_discount AS DOUBLE) AS f1,
               CAST(l_tax AS DOUBLE) AS f2,
               CAST(l_linenumber AS DOUBLE) AS f3,
               CASE WHEN l_quantity <= 25
                    THEN CASE WHEN l_tax >= 0.05 THEN 1 ELSE 0 END
                    ELSE CASE WHEN l_discount <= 0.03 THEN 1 ELSE 0 END
               END AS y,
               CAST(concat('0x', substring(md5(
                 CAST(l_orderkey AS VARCHAR) || '|$hashSeed'), 1, 15))
                 AS BIGINT) % $nFolds AS h
        FROM lineitem)
        GROUP BY f0, f1, f2, f3, y, h),
      $chains,
      rows_ AS ($rows),
      m AS (SELECT max_depth, fold, n_val, macro_f1_micro,
                   CAST(SUM(macro_f1_micro) OVER (PARTITION BY max_depth)
                     AS BIGINT) AS sum_f1_micro
            FROM rows_),
      b AS (SELECT max_depth AS best_depth FROM m
            ORDER BY sum_f1_micro DESC, max_depth ASC, fold ASC LIMIT 1)
      SELECT m.max_depth, m.fold, m.n_val, m.macro_f1_micro,
             m.sum_f1_micro, b.best_depth,
             CAST(CASE WHEN m.max_depth = b.best_depth THEN 1 ELSE 0 END
               AS BIGINT) AS selected
      FROM m, b ORDER BY max_depth, fold"""
  }

  override def queries: Seq[GraftQuery] = Seq(cvGrid)
}
