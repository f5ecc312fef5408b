package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift profiling between two shards of the same table —
  * the check a pipeline runs before accepting a new data drop against
  * the corpus it already has.
  *
  * Drift is total-variation distance computed on integer micro-shares:
  * each side's per-value share becomes `(c * 1e6) div n` (exact integer,
  * bounded by 1e6 no matter the row count), the per-value absolute
  * differences sum as integers, and only the final presentation divides.
  * No floating-point accumulation anywhere, so the report is identical
  * across partitionings and engines and never overflows at scale (the
  * naive cross-product form `c_old * n_new` would).
  */
object Drift {

  /** One drift row for one column: value distributions compared as
    * strings (null-safe full outer join on the value).
    *
    * @return (col_name, n_old, n_new, values_old, values_new, tv_micro,
    *         tv) where tv = tv_micro / 2e6 in [0, 1]
    */
  def columnDrift(old: DataFrame, nw: DataFrame, c: String): DataFrame = {
    val oc = old.groupBy(col(c).cast("string").as("vo"))
      .agg(count(lit(1)).as("co"))
    val nc = nw.groupBy(col(c).cast("string").as("vn"))
      .agg(count(lit(1)).as("cn"))
    val tot = old.agg(count(lit(1)).as("n_old"))
      .crossJoin(nw.agg(count(lit(1)).as("n_new")))
    oc.join(nc, col("vo") <=> col("vn"), "full")
      .crossJoin(broadcast(tot))
      .select(
        col("n_old"), col("n_new"),
        col("co").isNotNull.cast("long").as("has_o"),
        col("cn").isNotNull.cast("long").as("has_n"),
        // an empty side holds zero share of every value (guards the
        // ANSI integer-div-by-zero on a fully missing shard)
        abs(expr("""case when n_old = 0 then 0L
                    else coalesce(co, 0L) * 1000000L div n_old end""") -
          expr("""case when n_new = 0 then 0L
                  else coalesce(cn, 0L) * 1000000L div n_new end"""))
          .as("d"))
      .agg(
        max("n_old").as("n_old"), max("n_new").as("n_new"),
        sum("has_o").as("values_old"), sum("has_n").as("values_new"),
        sum("d").as("tv_micro"))
      .select(
        lit(c).as("col_name"), col("n_old"), col("n_new"),
        col("values_old"), col("values_new"), col("tv_micro"),
        graft.Q.r6(col("tv_micro") / 2000000.0).as("tv"))
  }

  /** One row per column, unioned. */
  def report(old: DataFrame, nw: DataFrame, cols: Seq[String]): DataFrame =
    cols.map(columnDrift(old, nw, _)).reduce(_.unionByName(_))

  /** Row-level snapshot diff: added / removed / changed / unchanged
    * counts between two keyed snapshots, comparing a caller-supplied
    * fingerprint column — one full outer join on the key, no content
    * shuffle beyond the fingerprints. The data-diff a pipeline prints
    * before replacing yesterday's table.
    */
  def snapshotDiff(
      old: DataFrame, nw: DataFrame, key: String,
      fp: org.apache.spark.sql.Column): DataFrame = {
    val o = old.select(col(key).as("__ko"), fp.as("__fo"))
    val n = nw.select(col(key).as("__kn"), fp.as("__fn"))
    o.join(n, col("__ko") === col("__kn"), "full")
      .agg(
        sum(when(col("__ko").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__kn").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__ko").isNotNull && col("__kn").isNotNull &&
          col("__fo") =!= col("__fn"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("__fo") === col("__fn"), 1L).otherwise(0L))
          .as("n_unchanged"))
  }

  /** The SQL replay for one column's drift row, given CTEs `o` and `n`
    * (the two shards) in scope.
    */
  def columnDriftSql(c: String): String =
    s"""SELECT '$c' AS col_name,
          MAX(t.n_old) AS n_old, MAX(t.n_new) AS n_new,
          CAST(SUM(CASE WHEN oc.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS values_old,
          CAST(SUM(CASE WHEN nc.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS values_new,
          CAST(SUM(ABS(
            CASE WHEN t.n_old = 0 THEN 0
                 ELSE COALESCE(oc.c, 0) * 1000000 // t.n_old END
            - CASE WHEN t.n_new = 0 THEN 0
                   ELSE COALESCE(nc.c, 0) * 1000000 // t.n_new END))
            AS BIGINT) AS tv_micro,
          round(CAST(SUM(ABS(
            CASE WHEN t.n_old = 0 THEN 0
                 ELSE COALESCE(oc.c, 0) * 1000000 // t.n_old END
            - CASE WHEN t.n_new = 0 THEN 0
                   ELSE COALESCE(nc.c, 0) * 1000000 // t.n_new END))
                AS DOUBLE) / 2000000.0, 6) AS tv
       FROM (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS c
             FROM o GROUP BY 1) oc
       FULL JOIN (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS c
                  FROM n GROUP BY 1) nc
         ON oc.v IS NOT DISTINCT FROM nc.v
       CROSS JOIN (SELECT (SELECT COUNT(*) FROM o) AS n_old,
                          (SELECT COUNT(*) FROM n) AS n_new) t"""
}
