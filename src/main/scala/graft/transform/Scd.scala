package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history compaction: collapse a
  * row-per-observation attribute stream into one row per consecutive
  * run of equal values, with [valid_from, valid_to) validity ranges and
  * a current-row flag — the standard warehouse upsert shape.
  *
  * Two key-partitioned window passes (change flag + running version)
  * and one aggregation, all shuffling on the key only, so the operator
  * scales with the dimension's history, never the fact volume. Run
  * boundaries are deterministic because callers pass a total order
  * (`ordCols` must break ties, e.g. a sequence/primary key last).
  */
object Scd {

  /** @param df      one row per observation
    * @param key     entity column
    * @param attr    tracked attribute (runs of equal values collapse);
    *                null-safe comparison, so null runs compact too
    * @param ordCols total per-key observation order (include a tiebreak)
    * @return (key, version, attr, valid_from, valid_to, n_rows,
    *         is_current) with valid_from/valid_to taken from the first
    *         `ordCols` column; valid_to is the next version's
    *         valid_from, null on the open (current) version
    */
  def scd2Compact(
      df: DataFrame, key: String, attr: String,
      ordCols: Seq[String]): DataFrame = {
    require(ordCols.nonEmpty)
    val w = Window.partitionBy(key).orderBy(ordCols.map(col): _*)
    val versions = df
      .withColumn("__chg",
        when(lag(col(attr), 1).over(w) <=> col(attr), 0).otherwise(1))
      .withColumn("version",
        sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("long"))
    val runs = versions
      .groupBy(col(key), col("version"))
      .agg(
        min(col(attr)).as(attr), // constant within a run
        min(col(ordCols.head)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(key).orderBy("version")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time (temporal as-of) lookup against an SCD2 history: for
    * each probe row, the version whose validity range covers the probe
    * timestamp — resolved as the highest version with
    * `valid_from <= ts` (equivalent to the range test when ranges
    * chain, and well-defined under same-timestamp version stacks).
    * One equi-join on the key plus a per-probe argmax window; history
    * rows per key are few, so the join fans out modestly and the window
    * partitions by probe row id.
    */
  def pointInTime(
      history: DataFrame, probes: DataFrame, key: String, ts: String,
      probeId: String, attr: String): DataFrame = {
    val h = history.select(
      col(key).as("__k"), col("version").as("__v"),
      col(attr).as(s"${attr}_at_ts"), col("valid_from").as("__vf"))
    val w = Window.partitionBy(probeId).orderBy(desc("__v"))
    probes
      .join(h, probes(key) === h("__k") && col("__vf") <= probes(ts))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .withColumn("version_at_ts", col("__v"))
      .drop("__k", "__v", "__vf", "__rk")
  }
}
