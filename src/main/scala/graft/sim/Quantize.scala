package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/serving format a
  * 100-TB embedding corpus actually ships (4x smaller than float32, SIMD
  * dot products downstream): per-vector scale = max|x| / 127, codes =
  * round(x / scale). Pure array expressions per row, no shuffle.
  *
  * The error report uses ORDER-INDEPENDENT reductions only (max over
  * elements, saturation count) so results are bit-stable across
  * engines and partitionings — an L2 norm would fold in array order.
  */
object Quantize {

  /** Adds `scaleCol` (double, max|x|/127 — 0.0 for a zero vector) and
    * `qCol` (array<int> codes) for the float/double array `vecCol`.
    */
  def withInt8(
      df: DataFrame, vecCol: String, scaleCol: String,
      qCol: String): DataFrame = {
    val raw = array_max(transform(col(vecCol), x => abs(x.cast("double")))) /
      lit(127.0)
    df.withColumn(scaleCol, raw)
      .withColumn(qCol, {
        // zero vectors: divide by 1 instead -> all-zero codes
        val safe = when(col(scaleCol) === 0.0, lit(1.0))
          .otherwise(col(scaleCol))
        transform(col(vecCol),
          x => round(x.cast("double") / safe).cast("int"))
      })
  }

  /** Per-vector reconstruction report: scale, saturated-code count,
    * max absolute dequantization error.
    */
  def reportInt8(
      df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = withInt8(df, vecCol, "__scale", "__q")
    val safe = when(col("__scale") === 0.0, lit(1.0)).otherwise(col("__scale"))
    q.select(
      col(idCol),
      col("__scale").as("scale"),
      size(filter(col("__q"), c => abs(c) === 127)).as("n_saturated"),
      array_max(zip_with(col(vecCol), col("__q"),
        (x, c) => abs(x.cast("double") - c * safe))).as("max_abs_err"))
  }
}
