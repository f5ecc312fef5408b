package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy sequence packing for LLM training batches: within each group,
  * documents (ordered by id) are appended to the current pack while the
  * token budget holds; a document that would overflow starts a new pack,
  * and an oversized document occupies a pack alone.
  *
  * Scale design: groups pack independently and in parallel
  * (`flatMapSortedGroups`) — the per-group scan is inherently sequential,
  * which is exactly why the 100-TB form shards the corpus by group key
  * first (shard = lang, source, date bucket, ...): parallelism = #groups,
  * state = O(1) per group, output streamed from the sorted iterator with
  * no group materialization. Deterministic: (group, id) is a total order.
  */
object Packing {

  /** One row per document: (groupCol, idCol, weight, pack), pack ids
    * numbered from 0 within each group in ascending id order.
    */
  def packGreedy(
      df: DataFrame, groupCol: String, idCol: String, weightCol: Column,
      budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        weightCol.cast("long").as("w"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) {
        (g: String, it: Iterator[(String, Long, Long)]) =>
          var pack = 0L
          var acc = 0L
          var first = true
          it.map { case (_, id, w) =>
            if (first) { first = false; acc = w }
            else if (acc + w > budget) { pack += 1; acc = w }
            else acc += w
            (g, id, w, pack)
          }
      }
      .toDF(groupCol, idCol, "weight", "pack")
  }
}
