package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import graft.stats.Stats

/** Oracle-checked queries for the profiling module (SURVEY §2.4). */
object StatsQueries extends QueryPack {

  val profile: GraftQuery = GraftQuery(
    "profile_lineitem",
    (s, dir) => Stats.profileNumeric(
      Tables(s, dir, "lineitem"),
      Seq("l_quantity" -> 0, "l_extendedprice" -> 2,
        "l_discount" -> 2, "l_tax" -> 2)),
    Some {
      def one(c: String, scale: Long) =
        s"""SELECT '$c' AS "column", COUNT($c) AS n_rows,
           CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT $c) AS n_distinct,
           round(SUM(CAST(round($c * $scale) AS BIGINT)) / $scale.0 / COUNT($c), 6) AS mean,
           round(stddev_samp($c), 4) AS std,
           CAST(MIN($c) AS DOUBLE) AS "min",
           round(quantile_cont($c, 0.25), 6) AS p25,
           round(quantile_cont($c, 0.50), 6) AS p50,
           round(quantile_cont($c, 0.75), 6) AS p75,
           CAST(MAX($c) AS DOUBLE) AS "max"
           FROM lineitem"""
      Seq("l_quantity" -> 1L, "l_extendedprice" -> 100L,
        "l_discount" -> 100L, "l_tax" -> 100L)
        .map { case (c, sc) => one(c, sc) }
        .mkString("", " UNION ALL ", " ORDER BY \"column\"")
    })

  val valueCounts: GraftQuery = GraftQuery(
    "value_counts_priority",
    (s, dir) => Stats.valueCounts(Tables(s, dir, "orders"), "o_orderpriority"),
    Some("""
      WITH c AS (SELECT o_orderpriority, COUNT(*) AS n
                 FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, n,
             round(n * 1.0 / (SELECT SUM(n) FROM c), 6) AS share
      FROM c ORDER BY n DESC, o_orderpriority"""))

  val nullCounts: GraftQuery = GraftQuery(
    "null_counts_orders",
    (s, dir) => Stats.nullCounts(
      Tables(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")),
    Some(Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS "column",
           CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
           FROM orders""")
      .mkString("", " UNION ALL ", " ORDER BY \"column\"")))

  val corrMatrix: GraftQuery = GraftQuery(
    "corr_pairs_lineitem",
    (s, dir) => Stats.corrPairs(
      Tables(s, dir, "lineitem"),
      Seq("l_quantity" -> "l_extendedprice", "l_quantity" -> "l_discount",
        "l_extendedprice" -> "l_discount", "l_extendedprice" -> "l_tax")),
    Some(Seq(
        "l_quantity" -> "l_extendedprice", "l_quantity" -> "l_discount",
        "l_extendedprice" -> "l_discount", "l_extendedprice" -> "l_tax")
      .map { case (a, b) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           round(corr($a, $b), 6) AS corr FROM lineitem"""
      }
      .mkString("", " UNION ALL ", " ORDER BY col_a, col_b")))

  val crosstab: GraftQuery = GraftQuery(
    "crosstab_flag_status",
    (s, dir) => Stats.crosstabShares(
      Tables(s, dir, "lineitem"), "l_returnflag", "l_linestatus",
      Seq("F", "O")),
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
             round(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS share_F,
             round(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS share_O,
             COUNT(*) AS n_total
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val entropyGini: GraftQuery = GraftQuery(
    "entropy_gini_returnflag",
    (s, dir) => Stats.entropyGini(Tables(s, dir, "lineitem"), "l_returnflag"),
    Some("""
      WITH c AS (SELECT l_returnflag, COUNT(*) AS n
                 FROM lineitem GROUP BY l_returnflag),
      p AS (SELECT n * 1.0 / (SELECT SUM(n) FROM c) AS p FROM c)
      SELECT round(-SUM(p * log2(p)), 6) AS entropy,
             round(1.0 - SUM(pow(p, 2)), 6) AS gini
      FROM p"""))

  val skewKurt: GraftQuery = GraftQuery(
    "skew_kurtosis_discount",
    (s, dir) => Stats.skewKurtosis(
      Tables(s, dir, "lineitem"), Seq("l_discount" -> 2, "l_tax" -> 2)),
    Some {
      // pandas bias-corrected G1 / G2 from exact scaled-integer moments,
      // replicating Stats.skewKurtosis arithmetic step by step.
      def one(c: String) =
        s"""SELECT '$c' AS "column",
           round((s3 / n) / pow(s2 / n, 1.5) * sqrt(n * (n - 1)) / (n - 2), 6) AS skewness,
           round(((n + 1) * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0) + 6) * (n - 1) / ((n - 2) * (n - 3)), 6) AS kurtosis
           FROM (
             SELECT SUM(pow(x - m, 2)) AS s2, SUM(pow(x - m, 3)) AS s3,
                    SUM(pow(x - m, 4)) AS s4, CAST(COUNT(*) AS DOUBLE) AS n
             FROM (SELECT CAST(round($c * 100) AS BIGINT) AS xi,
                          CAST(CAST(round($c * 100) AS BIGINT) AS DOUBLE) AS x
                   FROM lineitem),
                  (SELECT SUM(CAST(round($c * 100) AS BIGINT)) * 1.0 / COUNT($c) AS m
                   FROM lineitem))"""
      Seq("l_discount", "l_tax").map(one)
        .mkString("", " UNION ALL ", " ORDER BY \"column\"")
    })

  /** Per-feature correlation against the label, ranked by |corr|
    * (Sol_2.ipynb cell 5 feature ranking).
    */
  val corrVsLabel: GraftQuery = GraftQuery(
    "corr_vs_label_ranked",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val d = Tables(s, dir, "lineitem").select(
        col("l_quantity"), col("l_discount"), col("l_tax"),
        col("l_extendedprice"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"))
      Stats.corrPairs(d, Seq(
          "l_quantity" -> "label", "l_discount" -> "label",
          "l_tax" -> "label", "l_extendedprice" -> "label"))
        .withColumnRenamed("col_a", "feature").drop("col_b")
        .orderBy(abs(col("corr")).desc, col("feature"))
    },
    Some {
      def one(c: String) =
        s"""SELECT '$c' AS feature,
           round(corr($c, CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 6) AS corr
           FROM lineitem"""
      Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice").map(one)
        .mkString("SELECT feature, corr FROM (",
          " UNION ALL ", ") ORDER BY abs(corr) DESC, feature")
    })

  override def queries: Seq[GraftQuery] = Seq(
    profile, valueCounts, nullCounts, corrMatrix, crosstab, entropyGini,
    skewKurt, corrVsLabel)
}
