package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run shuffle-free — the co-located
  * join strategy for 100-TB fact-fact joins (both sides bucketed on the
  * key into the same bucket count -> SortMergeJoin without Exchange).
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True if the executed plan contains no shuffle (Exchange) node. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
