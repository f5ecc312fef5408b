package graft.transform

import graft.Q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale/clip transforms beyond standardization — min-max to [0,1],
  * robust (median/IQR), and quantile winsorization — rounding out the
  * reference's feature-prep family (house_predict.py:84-100 fit/apply
  * shape, Sol_2.ipynb cell 7 scaling). One wide aggregation fits every
  * statistic (exact interpolated percentiles + min/max in a single
  * pass); transforms are pure projections on driver-held scalars, so
  * application is a zero-shuffle scan at any scale.
  */
object Scaling {

  final case class ScaleStats(
      column: String, mn: Double, mx: Double,
      p01: Double, p25: Double, p50: Double, p75: Double, p99: Double) {

    /** (x - min) / (max - min), r6-rounded. */
    def minMax(c: Column): Column = Q.r6((c - mn) / (mx - mn))

    /** (x - median) / IQR, r6-rounded — outlier-insensitive z-score. */
    def robustZ(c: Column): Column = Q.r6((c - p50) / (p75 - p25))

    /** Winsorize: clip into [p01, p99], r6-rounded. */
    def winsorize(c: Column): Column =
      Q.r6(least(greatest(c, lit(p01)), lit(p99)))
  }

  /** Fit min/max + the p01/p25/p50/p75/p99 grid in ONE aggregation pass
    * (exact linear-interpolated percentiles — same semantics as DuckDB
    * `quantile_cont`).
    */
  def fit(df: DataFrame, column: String): ScaleStats = {
    val r = df
      .agg(
        expr(s"percentile($column, array(0.01, 0.25, 0.5, 0.75, 0.99))")
          .as("qs"),
        min(col(column)).cast("double").as("mn"),
        max(col(column)).cast("double").as("mx"))
      .head()
    require(!r.isNullAt(0),
      s"Scaling.fit: column '$column' has no non-null rows")
    val qs = r.getSeq[Double](0)
    ScaleStats(column, r.getDouble(1), r.getDouble(2),
      qs(0), qs(1), qs(2), qs(3), qs(4))
  }
}
