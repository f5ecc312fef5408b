package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-style MERGE / CDC apply: reconcile a snapshot with a change
  * batch keyed by a unique id, where each change row carries an op code
  * ('I' insert / 'U' update / 'D' delete). The reference's workflow
  * re-writes whole tables per step (`sol_2/house_predict.py:565-566`
  * reloads CSVs each run); this operator is the incremental path a
  * 100 TB corpus needs instead — apply the day's changes, never rewrite
  * the snapshot.
  *
  * Semantics are matched-state driven (the MERGE contract): a matched
  * key with op 'D' is deleted, any other matched change replaces the
  * row ("updated"), an unmatched non-delete change is inserted, an
  * unmatched 'D' is a no-op, and snapshot rows with no change pass
  * through ("kept"). At most one change per key is assumed (CDC batches
  * are compacted upstream; [[graft.queries.EventQueries]]'s SCD2 query
  * is the history-keeping twin).
  *
  * Scale shape: ONE full-outer equi-join on the key — sort-merge by
  * default; with the snapshot bucketed by key it is shuffle-free on the
  * snapshot side, and a small change batch broadcasts. No windows, no
  * skew term (keys are unique on both sides).
  */
object Merge {

  /** @param snapshot current table state
    * @param changes  change batch: same columns as snapshot plus `opCol`
    * @param key      unique key column present in both
    * @param opCol    op code column in `changes`: 'I' | 'U' | 'D'
    * @return merged state plus a `src` column: kept | updated | inserted
    */
  def applyChanges(
      snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == key).toSeq
    require(dataCols.forall(changes.columns.contains),
      "changes must carry every snapshot column")
    val ch = changes.select(
      col(key).as("_k") +: col(opCol).as("_op") +:
        dataCols.map(c => col(c).as(s"_u_$c")): _*)
    snapshot
      .join(ch, col(key) === col("_k"), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(
        coalesce(col(key), col("_k")).as(key) +:
          dataCols.map(c =>
            when(col("_op").isNull, col(c))
              .otherwise(col(s"_u_$c")).as(c)) :+
          when(col("_op").isNull, lit("kept"))
            .when(col(key).isNull, lit("inserted"))
            .otherwise(lit("updated")).as("src"): _*)
  }
}
