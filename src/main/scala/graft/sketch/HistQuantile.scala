package graft.sketch

import graft.Q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-grid histogram quantiles over an exact-2-decimal money column:
  * two passes (min/max, then a b-bucket histogram on integer cents) and a
  * b-row cumulative scan give every requested quantile with error bounded
  * by one bucket width.
  *
  * This is the at-scale answer to SURVEY §4.2's "exact percentile is
  * memory-heavy per group" note: exact `percentile` keeps every value per
  * group in memory, while this sketch's state is b counters no matter the
  * row count, and the integer-cents bucket math is deterministic and
  * engine-independent (the estimate is the bucket's lower edge — a value
  * the oracle reproduces bit-for-bit, unlike interpolated digests).
  */
object HistQuantile {

  /** (prob, est) per requested probability: est = lower edge (in the
    * original currency unit) of the first bucket whose cumulative count
    * reaches ceil(prob * n). `probs` must be exactly-representable
    * doubles (dyadic rationals like 0.25/0.5/0.75) for cross-engine
    * threshold parity.
    */
  def estimate(
      df: DataFrame, valueCol: Column, nBins: Int,
      probs: Seq[Double]): DataFrame = {
    val cents = Q.cents(valueCol)
    val c = df.select(cents.as("v"))
    // pass 1: bounds + count (one 1-row agg)
    val mm = c.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n")).head()
    val (lo, hi, n) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    // ceil width so bucket ids stay in [0, nBins)
    val w = ((hi - lo) / nBins) + 1
    // pass 2: the fixed-size histogram. Integer DIV, not `/` (Spark's /
    // on longs is double division — a truncation hazard the oracle's `//`
    // doesn't share)
    val hist = c.groupBy(expr(s"(v - ${lo}L) DIV ${w}L").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val cum = hist.select(col("b"), col("cnt"),
      sum("cnt").over(org.apache.spark.sql.expressions.Window
        .orderBy("b").rowsBetween(Long.MinValue, 0)).as("cum"))
    val spark = df.sparkSession
    import spark.implicits._
    val p = probs.toDF("prob")
    // smallest bucket whose cumulative count reaches prob*n; its lower
    // edge in currency units. n, lo, w are scalars — broadcast literals.
    p.crossJoin(cum)
      .filter(col("cum") >= col("prob") * n)
      .groupBy("prob").agg(min("b").as("b"))
      .select(col("prob"),
        ((col("b") * w + lo) / 100.0).as("est"))
      .orderBy("prob")
  }
}
