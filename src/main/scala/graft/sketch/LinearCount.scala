package graft.sketch

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear-counting distinct estimator (Whang, Vander-Zanden & Taylor,
  * "A linear-time probabilistic counting algorithm for database
  * applications", TODS 1990): hash each item into one of m buckets and
  * count occupied buckets V; the estimate is -m * ln(1 - V/m).
  *
  * Scale design: the per-group state is AT MOST m bucket ids (m bits as a
  * bitmap in a serious implementation) versus exact count-distinct's
  * shuffle of every distinct value — the bounded-memory cardinality
  * primitive for per-source vocabulary monitoring at 100 TB. Buckets use
  * the seeded cross-engine md5-60 family, so the whole estimator replays
  * in DuckDB (the repo's lm/tree oracles already established that Spark
  * and DuckDB `ln` agree bit-for-bit on this data).
  */
object LinearCount {

  /** Per-group (occupied, est_distinct): one groupBy over (group, bucket)
    * partial-aggregates to <= m rows per group before the shuffle.
    * `est_distinct` is NULL when every bucket is occupied (the estimator
    * saturates; pick a larger m).
    */
  def estimateByGroup(
      items: DataFrame, groupCol: String, itemCol: String,
      m: Int): DataFrame =
    items
      .select(col(groupCol),
        (Dedup.md5Hash60(col(itemCol), 0) % m).as("bucket"))
      .groupBy(groupCol)
      .agg(countDistinct("bucket").as("occupied"))
      .select(
        col(groupCol), col("occupied"),
        when(col("occupied") === m, lit(null).cast("double"))
          .otherwise(-lit(m.toDouble) *
            log(lit(1.0) - col("occupied") / lit(m.toDouble)))
          .as("est_distinct"))
}
