package graft.split

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/validation splitting (SURVEY §2.8 M6; reference
  * house_predict.py:589-591 `train_test_split(stratify=y, seed=42)`).
  *
  * NumPy-seed parity is impossible (SURVEY §7.4.3), so determinism is
  * internal: a fixed seed gives the same Spark result every run, and the
  * oracle-checked path uses hash-splits (key modulo) which are exactly
  * expressible in SQL.
  */
object Splits {

  /** Deterministic, oracle-expressible k-fold assignment by key modulo.
    * Zero shuffles — a pure projection.
    */
  def hashFold(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("fold", pmod(col(idCol), lit(k.toLong)).cast("int"))

  /** Deterministic hash sampling: keep rows whose seeded 60-bit md5 hash
    * of `keyCol` lands in the lowest `pct` of 100 buckets. Pure
    * projection, reproducible across runs AND engines (the hash is
    * DuckDB-expressible), and — unlike `hashFold`'s modulo — immune to
    * id-assignment patterns. The training-corpus downsampling primitive.
    */
  def hashSample(
      df: DataFrame, keyCol: org.apache.spark.sql.Column, pct: Int,
      seed: Int = 0): DataFrame =
    df.filter(
      graft.dedup.Dedup.md5Hash60(keyCol.cast("string"), seed) % 100 < pct)

  /** Seeded random split: fraction `frac` -> split=0 (train), rest ->
    * split=1. Pure projection (rand is per-row, no shuffle).
    */
  def seededSplit(df: DataFrame, frac: Double, seed: Long): DataFrame =
    df.withColumn("split", when(rand(seed) < frac, 0).otherwise(1))

  /** Stratified split with exact per-class proportions: shuffle each class
    * by seeded rand, take the first ceil(frac*n_class) rows as train.
    * One shuffle (window partitioned by label).
    */
  def stratifiedSplit(
      df: DataFrame, labelCol: String, frac: Double, seed: Long): DataFrame = {
    val w = Window.partitionBy(labelCol).orderBy(rand(seed))
    val counts = Window.partitionBy(labelCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(counts))
      .withColumn(
        "split",
        when(col("__rn") <= ceil(col("__n") * frac), 0).otherwise(1))
      .drop("__rn", "__n")
  }
}
