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

  override def queries: Seq[GraftQuery] = Seq(riskFlags, binDesign)
}
