package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Discretization with pandas-`cut` edge semantics (reference:
  * sol_2/house_predict.py:58-106, 131-144): intervals right-closed `(a,b]`,
  * `include_lowest` makes the first interval `[e0,e1]`, duplicate edges are
  * dropped (`duplicates='drop'`), and null / out-of-range values map to
  * code -1 (pandas NaN -> -1 under `.cat.codes`).
  *
  * Fit is a single Spark aggregation (exact `percentile`, not
  * `approxQuantile` — bin boundaries must be exact for oracle parity);
  * transform compiles to a nested `when` chain — pure Catalyst expressions,
  * whole-stage-codegen friendly, no UDF, scale-independent.
  */
final case class BinModel(column: String, edges: Array[Double]) {
  require(edges.length >= 2, s"need >=2 distinct edges for $column")
  def nBins: Int = edges.length - 1

  /** Bucket-assignment expression implementing the `cut` semantics above:
    * the native codegen'd binary-search expression (O(log k) per row,
    * survives k in the thousands where a `when`-chain overflows codegen).
    */
  def expr: Column =
    graft.expressions.CutBucket.cutBucket(col(column).cast("double"), edges.toSeq)

  /** Equivalent composed-builtins form (O(k) `when`-chain) — kept for
    * plan comparison and as the no-custom-expression fallback.
    */
  def exprWhenChain: Column = {
    val c = col(column).cast("double")
    // e1..e(n-1) carry codes 0..n-2 (right-closed); anything still in range
    // is the last bucket. include_lowest is implied by the `< edges.head`
    // out-of-range guard.
    val base = when(
      c.isNull || c < lit(edges.head) || c > lit(edges.last), lit(-1))
    val chained = edges.tail.init.zipWithIndex.foldLeft(base) {
      case (acc, (e, i)) => acc.when(c <= lit(e), lit(i))
    }
    chained.otherwise(lit(nBins - 1)).cast("int")
  }

  def transform(df: DataFrame, out: String): DataFrame = df.withColumn(out, expr)
}

object Binning {
  /** duplicates='drop': collapse equal consecutive edges (sorted input). */
  def dedupEdges(edges: Array[Double]): Array[Double] = {
    val b = Array.newBuilder[Double]
    var last = Double.NaN
    edges.foreach { e => if (e != last) { b += e; last = e } }
    b.result()
  }

  /** Constant column: pandas `cut` raises; the engine degrades to a single
    * [v,v] bucket instead (documented divergence — a raise is useless in a
    * long-running distributed pipeline).
    */
  def atLeastOneBucket(edges: Array[Double]): Array[Double] =
    if (edges.length >= 2) edges else Array(edges.head, edges.head)
}

/** Equal-frequency binning: edges are exact quantiles i/n with the end
  * edges forced to the column min/max (house_predict.py:84-88).
  */
object QuantileBinner {
  def fit(df: DataFrame, column: String, nBins: Int): BinModel = {
    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    val row = df
      .agg(
        expr(s"percentile($column, array(${probs.mkString(",")}))").as("qs"),
        min(col(column)).cast("double").as("mn"),
        max(col(column)).cast("double").as("mx"))
      .head()
    val qs = row.getSeq[Double](0).toArray
    qs(0) = row.getDouble(1)
    qs(qs.length - 1) = row.getDouble(2)
    BinModel(column, Binning.atLeastOneBucket(Binning.dedupEdges(qs)))
  }

  /** Batched fit: ONE wide aggregation fits every (column, nBins) spec at
    * once — per-column `fit` calls cost one full scan each, which doesn't
    * survive wide tables at 100 TB.
    */
  def fitMany(df: DataFrame, specs: Seq[(String, Int)]): Map[String, BinModel] =
    if (specs.isEmpty) Map.empty
    else {
      val aggs = specs.flatMap { case (c, k) =>
        val probs = (0 to k).map(i => i.toDouble / k)
        Seq(
          expr(s"percentile($c, array(${probs.mkString(",")}))").as(s"${c}__qs"),
          min(col(c)).cast("double").as(s"${c}__mn"),
          max(col(c)).cast("double").as(s"${c}__mx"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      specs.map { case (c, _) =>
        val qs = row.getSeq[Double](row.fieldIndex(s"${c}__qs")).toArray
        qs(0) = row.getDouble(row.fieldIndex(s"${c}__mn"))
        qs(qs.length - 1) = row.getDouble(row.fieldIndex(s"${c}__mx"))
        c -> BinModel(c, Binning.atLeastOneBucket(Binning.dedupEdges(qs)))
      }.toMap
    }

  /** Scale path: Greenwald-Khanna approximate quantiles (single pass,
    * bounded memory per executor — exact `percentile` buffers every value
    * of a group in one reducer, which does not survive 100 TB).
    * `relativeError=0` degenerates to exact.
    */
  def fitApprox(
      df: DataFrame, column: String, nBins: Int,
      relativeError: Double = 0.001): BinModel = {
    val probs = (0 to nBins).map(i => i.toDouble / nBins).toArray
    val qs = df.stat.approxQuantile(column, probs, relativeError)
    val row = df.agg(
      min(col(column)).cast("double"), max(col(column)).cast("double")).head()
    qs(0) = row.getDouble(0)
    qs(qs.length - 1) = row.getDouble(1)
    BinModel(column, Binning.atLeastOneBucket(Binning.dedupEdges(qs)))
  }
}

/** Equal-width binning: edges linspace(min, max, n+1) computed on the fit
  * table (house_predict.py:81-83).
  */
object EqualWidthBinner {
  def fit(df: DataFrame, column: String, nBins: Int): BinModel = {
    val row = df
      .agg(min(col(column)).cast("double"), max(col(column)).cast("double"))
      .head()
    fromMinMax(column, nBins, row.getDouble(0), row.getDouble(1))
  }

  /** Build from already-known min/max (e.g. a prior profiling pass) —
    * zero extra scans; arithmetic identical to `fit`.
    */
  def fromMinMax(column: String, nBins: Int, mn: Double, mx: Double): BinModel = {
    val edges = (0 to nBins).map { i =>
      if (i == nBins) mx else mn + i * (mx - mn) / nBins
    }.toArray
    BinModel(column, Binning.atLeastOneBucket(Binning.dedupEdges(edges)))
  }
}
