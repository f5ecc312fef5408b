package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.stats.Profiling
import org.apache.spark.sql.functions.col

/** Oracle-checked queries for the profiling rule engine + adaptive
  * binning designer (data_analysis.ipynb cells 8/10). The oracle SQL
  * replicates the two-pass scaled-integer moment arithmetic step by step
  * so flags/strategies derived from doubles are cross-engine stable.
  */
object ProfilingQueries extends QueryPack {

  private val cols = Seq(
    "l_quantity" -> 1L, "l_discount" -> 100L, "l_tax" -> 100L,
    "l_extendedprice" -> 100L)

  private def statsSql(c: String, scale: Long) = s"""
    (SELECT p.nd, p.n,
            p.std / ((p.s1 * 1.0 / p.n) / $scale.0) AS cv,
            p.mx - p.mn AS rng, p.std,
            (m.s3 / p.n) / pow(m.s2 / p.n, 1.5) * sqrt(p.n * (p.n - 1)) / (p.n - 2) AS skew,
            ((p.n + 1) * ((m.s4 / p.n) / ((m.s2 / p.n) * (m.s2 / p.n)) - 3.0) + 6) * (p.n - 1) / ((p.n - 2) * (p.n - 3)) AS kurt
     FROM
      (SELECT SUM(CAST(round($c * $scale) AS BIGINT)) AS s1,
              CAST(COUNT($c) AS DOUBLE) AS n,
              COUNT(DISTINCT $c) AS nd,
              stddev_samp($c) AS std,
              CAST(MIN($c) AS DOUBLE) AS mn, CAST(MAX($c) AS DOUBLE) AS mx
       FROM lineitem) p,
      (SELECT SUM(pow(x - mm.m, 2)) AS s2, SUM(pow(x - mm.m, 3)) AS s3,
              SUM(pow(x - mm.m, 4)) AS s4
       FROM (SELECT CAST(CAST(round($c * $scale) AS BIGINT) AS DOUBLE) AS x
             FROM lineitem),
            (SELECT SUM(CAST(round($c * $scale) AS BIGINT)) * 1.0 / COUNT($c) AS m
             FROM lineitem) mm) m)"""

  val riskFlags: GraftQuery = GraftQuery(
    "risk_flags_lineitem",
    (s, dir) => Profiling.riskFlags(
      Tables(s, dir, "lineitem"),
      cols.map { case (c, sc) => c -> math.log10(sc.toDouble).toInt }),
    Some(cols.map { case (c, scale) =>
      s"""SELECT '$c' AS "column", nd AS n_unique,
         round(nd * 1.0 / n, 6) AS unique_ratio,
         round(cv, 6) AS cv, round(skew, 6) AS skewness,
         round(kurt, 6) AS kurtosis,
         CASE WHEN cv > 1.0 THEN 1 ELSE 0 END AS high_cv,
         CASE WHEN abs(skew) > 2.0 THEN 1 ELSE 0 END AS high_skew,
         CASE WHEN kurt > 3.0 THEN 1 ELSE 0 END AS high_kurtosis,
         CASE WHEN nd * 1.0 / n > 0.8 THEN 1 ELSE 0 END AS high_cardinality,
         CASE WHEN rng > 10 * std THEN 1 ELSE 0 END AS wide_range,
         (CASE WHEN cv > 1.0 THEN 1 ELSE 0 END)
           + (CASE WHEN abs(skew) > 2.0 THEN 1 ELSE 0 END)
           + (CASE WHEN kurt > 3.0 THEN 1 ELSE 0 END)
           + (CASE WHEN nd * 1.0 / n > 0.8 THEN 1 ELSE 0 END)
           + (CASE WHEN rng > 10 * std THEN 1 ELSE 0 END) AS risk_count
         FROM ${statsSql(c, scale)}"""
    }.mkString("", " UNION ALL ", " ORDER BY \"column\"")))

  val binDesign: GraftQuery = GraftQuery(
    "binning_design_lineitem",
    (s, dir) => Profiling.designReport(
        Tables(s, dir, "lineitem"),
        cols.map { case (c, sc) => c -> math.log10(sc.toDouble).toInt })
      .select("column", "n_unique", "unique_ratio", "skewness", "strategy",
        "n_bins"),
    Some(cols.map { case (c, scale) =>
      s"""SELECT '$c' AS "column", nd AS n_unique,
         round(nd * 1.0 / n, 6) AS unique_ratio,
         round(skew, 6) AS skewness,
         CASE WHEN nd * 1.0 / n > 0.5 OR abs(skew) > 1.0
              THEN 'quantile' ELSE 'equal_width' END AS strategy,
         CAST(GREATEST(3, LEAST(10, CAST(floor(sqrt(nd)) AS INTEGER))) AS INTEGER) AS n_bins
         FROM ${statsSql(c, scale)}"""
    }.mkString("", " UNION ALL ", " ORDER BY \"column\"")))

  /** Shard-vs-corpus distribution drift: the `doc_id % 10` "new drop"
    * against the standing corpus (same split as the incremental dedup
    * gate), per column — integer micro-share total variation, so the
    * gate is exact at any scale. See `graft.stats.Drift`.
    */
  val schemaDrift: GraftQuery = {
    val cols = Seq("lang", "source", "n_chars")
    GraftQuery(
      "schema_drift_report",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
        val isNew = col("doc_id") % 10 === 0
        graft.stats.Drift
          .report(d.filter(!isNew), d.filter(isNew), cols)
          .orderBy("col_name")
      },
      Some(s"""
        WITH o AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 10 <> 0),
        n AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 10 = 0)
        ${cols.map(graft.stats.Drift.columnDriftSql).mkString(" UNION ALL ")}
        ORDER BY col_name"""))
  }

  /** Join-cardinality profile for lineitem x orders on the order key —
    * the pre-flight a planner runs before a big-big join: exact output
    * size Σ c_l * c_r from the two per-key count aggregations (never the
    * join itself), the heaviest key's contribution, and a skew ratio
    * (max key's share of output x matched key count; 1.0 = uniform).
    */
  val joinSizeProfile: GraftQuery = GraftQuery(
    "join_size_profile",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val lc = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cl"))
      val oc = Tables(s, dir, "orders")
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cr"))
      lc.join(oc, Seq("k"))
        .select((col("cl") * col("cr")).as("rows_k"))
        .agg(
          count(lit(1)).as("n_matched_keys"),
          sum("rows_k").as("join_rows"),
          max("rows_k").as("max_key_rows"))
        .crossJoin(broadcast(
          lc.agg(count(lit(1)).as("n_keys_left"))
            .crossJoin(oc.agg(count(lit(1)).as("n_keys_right")))))
        .select(
          col("n_keys_left"), col("n_keys_right"), col("n_matched_keys"),
          col("join_rows"), col("max_key_rows"),
          graft.Q.r6(col("max_key_rows") * 1.0 * col("n_matched_keys")
            / col("join_rows")).as("skew_ratio"))
    },
    Some("""
      WITH lc AS (SELECT l_orderkey AS k, COUNT(*) AS cl
                  FROM lineitem GROUP BY 1),
      oc AS (SELECT o_orderkey AS k, COUNT(*) AS cr FROM orders GROUP BY 1),
      j AS (SELECT CAST(lc.cl * oc.cr AS BIGINT) AS rows_k
            FROM lc JOIN oc USING (k))
      SELECT (SELECT COUNT(*) FROM lc) AS n_keys_left,
             (SELECT COUNT(*) FROM oc) AS n_keys_right,
             COUNT(*) AS n_matched_keys,
             CAST(SUM(rows_k) AS BIGINT) AS join_rows,
             MAX(rows_k) AS max_key_rows,
             round(CAST(MAX(rows_k) AS DOUBLE) * COUNT(*)
                   / CAST(SUM(rows_k) AS BIGINT), 6) AS skew_ratio
      FROM j"""))

  /** Row-level snapshot diff gate: two deterministic document snapshots
    * (different deletion moduli; every third surviving doc edited in
    * the "new" one) compared by md5 fingerprint — the added / removed /
    * changed / unchanged report printed before a table swap.
    */
  val snapshotDiff: GraftQuery = GraftQuery(
    "snapshot_diff_report",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = Tables(s, dir, "documents")
      val old = d.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text")
      val nw = d.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      graft.stats.Drift.snapshotDiff(old, nw, "doc_id", md5(col("text")))
    },
    Some("""
      WITH o AS (SELECT doc_id, md5(text) AS fp FROM documents
                 WHERE doc_id % 7 <> 0),
      n AS (SELECT doc_id,
                   md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2'
                            ELSE text END) AS fp
            FROM documents WHERE doc_id % 5 <> 0)
      SELECT CAST(SUM(CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_added,
             CAST(SUM(CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
             CAST(SUM(CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                   AND o.fp <> n.fp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed,
             CAST(SUM(CASE WHEN o.fp = n.fp THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unchanged
      FROM o FULL JOIN n ON o.doc_id = n.doc_id"""))

  override def queries: Seq[GraftQuery] =
    Seq(riskFlags, binDesign, schemaDrift, joinSizeProfile, snapshotDiff)
}
