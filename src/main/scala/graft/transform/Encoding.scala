package graft.transform

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label encoding: string -> dense int code with sklearn semantics
  * (alphabetical vocabulary order; unseen category -> -1). Reference:
  * house_predict.py:118-127 (fit on train∪test) and Sol_2.ipynb cell 4
  * (fit=False path mapping unseen to -1).
  *
  * The vocabulary is a DataFrame (not a collected map): transform is a
  * broadcast equi-join + coalesce(-1), which scales to arbitrarily large
  * vocabularies and stays oracle-expressible (dense_rank over distinct).
  */
final case class LabelEncodeModel(column: String, vocab: DataFrame) {
  /** Adds `out` = dense code of `column`, -1 when unseen/null. */
  def transform(df: DataFrame, out: String): DataFrame =
    df.join(
        broadcast(vocab.withColumnRenamed("value", column)),
        Seq(column), "left")
      .withColumn(out, coalesce(col("__code"), lit(-1)))
      .drop("__code")
}

object LabelEncoder {
  /** Fit = sorted distinct non-null values -> codes 0..k-1.
    * Codes come from zipWithIndex over a range-sorted distinct set: the
    * sort is a parallel range partition and the index pass only counts
    * partition sizes — no single-task global window, so a 100M-term
    * vocabulary still fits. Order (and therefore every code) is identical
    * to the old global row_number.
    */
  def fit(df: DataFrame, column: String): LabelEncodeModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = df
      .select(col(column).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .distinct()
      .orderBy("value")
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF("value", "__idx")
      .select(col("value"), col("__idx").cast("int").as("__code"))
    LabelEncodeModel(column, vocab)
  }

  /** Fit over train∪test (house_predict.py:123). */
  def fitConcat(a: DataFrame, b: DataFrame, column: String): LabelEncodeModel =
    fit(a.select(column).unionByName(b.select(column)), column)
}

/** Standardization (x-mean)/std. sklearn's StandardScaler uses the biased
  * population std (ddof=0) — Sol_2.ipynb cell 5; pandas describe uses
  * ddof=1. Moments are computed from exact scaled-integer sums so the
  * transform is deterministic under any partitioning.
  */
final case class StandardizeModel(
    column: String, mean: Double, std: Double) {
  def transform(df: DataFrame, out: String): DataFrame =
    df.withColumn(out, Q.r6((col(column) - mean) / std))
}

object Standardizer {
  def fit(
      df: DataFrame, column: String, decimals: Int = 2,
      ddof: Int = 0): StandardizeModel = {
    import graft.stats.Stats.scaled
    val scale = math.pow(10, decimals)
    val r = df
      .agg(
        sum(scaled(col(column), decimals)).as("s1"),
        sum(pow(scaled(col(column), decimals).cast("double"), 2)).as("s2"),
        count(col(column)).as("n"))
      .head()
    val n = r.getLong(2).toDouble
    val mean = r.getLong(0) * 1.0 / n
    val variance = (r.getDouble(1) / n - mean * mean) * n / (n - ddof)
    StandardizeModel(column, mean / scale, math.sqrt(variance) / scale)
  }
}
