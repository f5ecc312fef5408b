package graft.stats

import graft.Q
import graft.transform.{BinModel, EqualWidthBinner, QuantileBinner}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's profiling rule engine and adaptive binning designer
  * (data_analysis.ipynb cells 7-10, SURVEY §3 entry point 3).
  *
  * Per column: two aggregation passes (exact scaled-integer mean +
  * cardinality + spread, then central moments), driver-side rule
  * evaluation on the tiny result. All thresholds are the reference's
  * (cell 8): CV>1.0, |skew|>2, kurtosis>3, unique_ratio>0.8,
  * range>10·std.
  */
object Profiling {

  final case class ColumnStats(
      column: String, n: Long, nUnique: Long, uniqueRatio: Double,
      mean: Double, std: Double, cv: Double, min: Double, max: Double,
      range: Double, skewness: Double, kurtosis: Double)

  def columnStats(df: DataFrame, cols: Seq[(String, Int)]): Seq[ColumnStats] = {
    // TWO scans total regardless of column count (wide aggs) — per-column
    // passes don't survive 100 TB. Arithmetic per column is unchanged.
    val p1aggs = cols.flatMap { case (c, d) =>
      Seq(
        sum(Stats.scaled(col(c), d)).as(s"${c}__s1"),
        count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__nd"),
        stddev_samp(col(c)).as(s"${c}__std"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"))
    }
    val p1 = df.agg(p1aggs.head, p1aggs.tail: _*).head()
    val meanS = cols.map { case (c, _) =>
      c -> p1.getAs[Long](s"${c}__s1") * 1.0 / p1.getAs[Long](s"${c}__n")
    }.toMap
    val p2aggs = cols.flatMap { case (c, d) =>
      val x = Stats.scaled(col(c), d).cast("double")
      // plain multiplications, not pow(): Math.pow costs ~100ns/call
      // (3 calls x rows x columns on this pass) where the products are
      // single fused ops. pow(y,2) and y*y are both the correctly
      // rounded square; the cubed/fourth powers round once more per
      // product, within the same ulp band as the two engines' differing
      // libm pow already sits — the r6-rounded outputs are unchanged
      // (re-verified against the DuckDB pow() oracle at both scales).
      val dlt = x - meanS(c)
      val d2 = dlt * dlt
      Seq(
        sum(d2).as(s"${c}__s2"),
        sum(d2 * dlt).as(s"${c}__s3"),
        sum(d2 * d2).as(s"${c}__s4"))
    }
    val p2 = df.agg(p2aggs.head, p2aggs.tail: _*).head()
    cols.map { case (c, d) =>
      val scale = math.pow(10, d)
      val n = p1.getAs[Long](s"${c}__n").toDouble
      val mean = meanS(c) / scale
      val std = p1.getAs[Double](s"${c}__std")
      val (m2, m3, m4) = (
        p2.getAs[Double](s"${c}__s2") / n,
        p2.getAs[Double](s"${c}__s3") / n,
        p2.getAs[Double](s"${c}__s4") / n)
      val g1 = m3 / math.pow(m2, 1.5)
      val skew = g1 * math.sqrt(n * (n - 1)) / (n - 2)
      val g2 = m4 / (m2 * m2) - 3.0
      val kurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
      ColumnStats(c, n.toLong, p1.getAs[Long](s"${c}__nd"),
        p1.getAs[Long](s"${c}__nd") * 1.0 / n, mean, std, std / mean,
        p1.getAs[Double](s"${c}__mn"), p1.getAs[Double](s"${c}__mx"),
        p1.getAs[Double](s"${c}__mx") - p1.getAs[Double](s"${c}__mn"),
        skew, kurt)
    }
  }

  /** Overfitting-risk flags per column (cell 8 rules), flags as 0/1. */
  def riskFlags(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    columnStats(df, cols).map { s =>
      val highCv = if (s.cv > 1.0) 1 else 0
      val highSkew = if (math.abs(s.skewness) > 2.0) 1 else 0
      val highKurt = if (s.kurtosis > 3.0) 1 else 0
      val highCard = if (s.uniqueRatio > 0.8) 1 else 0
      val wideRange = if (s.range > 10 * s.std) 1 else 0
      (s.column, s.nUnique, Q.r6Double(s.uniqueRatio), Q.r6Double(s.cv),
        Q.r6Double(s.skewness), Q.r6Double(s.kurtosis), highCv, highSkew,
        highKurt, highCard, wideRange,
        highCv + highSkew + highKurt + highCard + wideRange)
    }.toDF("column", "n_unique", "unique_ratio", "cv", "skewness",
      "kurtosis", "high_cv", "high_skew", "high_kurtosis",
      "high_cardinality", "wide_range", "risk_count")
      .orderBy("column")
  }

  /** Adaptive binning design (cell 10): strategy by unique-ratio/skew
    * thresholds, n_bins = clamp(floor(sqrt(n_unique)), 3, 10); returns
    * the design report and fitted bin models.
    */
  final case class BinDesign(
      column: String, strategy: String, nBins: Int, model: BinModel)

  def designBinning(
      df: DataFrame, cols: Seq[(String, Int)]): Seq[BinDesign] =
    designBinningFor(df, columnStats(df, cols))

  def designBinningFor(df: DataFrame, stats: Seq[ColumnStats]): Seq[BinDesign] = {
    val chosen = stats.map { s =>
      val strategy =
        if (s.uniqueRatio > 0.5 || math.abs(s.skewness) > 1.0) "quantile"
        else "equal_width"
      val nBins = math.max(3, math.min(10, math.sqrt(s.nUnique).toInt))
      (s, strategy, nBins)
    }
    // one extra scan total: all quantile columns fit in ONE wide agg;
    // equal-width edges come straight from the stats already in hand
    val qModels = QuantileBinner.fitMany(
      df, chosen.collect { case (s, "quantile", k) => s.column -> k })
    chosen.map { case (s, strategy, nBins) =>
      val model = strategy match {
        case "quantile"    => qModels(s.column)
        case "equal_width" => EqualWidthBinner.fromMinMax(s.column, nBins, s.min, s.max)
      }
      BinDesign(s.column, strategy, nBins, model)
    }
  }

  def designReport(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = columnStats(df, cols)
    designBinningFor(df, stats).zip(stats).map { case (d, s) =>
      (d.column, s.nUnique, Q.r6Double(s.uniqueRatio),
        Q.r6Double(s.skewness), d.strategy, d.nBins,
        d.model.nBins) // effective bins after duplicate-edge drop
    }.toDF("column", "n_unique", "unique_ratio", "skewness", "strategy",
      "n_bins", "effective_bins")
      .orderBy("column")
  }
}
