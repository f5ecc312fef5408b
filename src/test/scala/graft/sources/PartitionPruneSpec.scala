package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the plan property `partitioned_roundtrip_docs` relies on: a
  * filter on the partition column must become a PartitionFilter (file
  * pruning at planning time), not a post-scan predicate — at 100 TB the
  * difference is reading one directory versus the whole dataset.
  */
class PartitionPruneSpec extends AnyFunSuite with SparkTestSession {

  test("filter on the partition column prunes at the file level") {
    import spark.implicits._
    val path = "/tmp/graft_prune_spec"
    Seq((1L, "a", "en"), (2L, "b", "fr"), (3L, "c", "en"))
      .toDF("id", "payload", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(path)
    val q = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"expected partition filters in scan; plan:\n$plan")
    assert(plan.linesIterator
        .filter(_.contains("PartitionFilters")).mkString
        .contains("lang"),
      "the lang predicate must prune partitions, not filter rows")
    // the pruned read returns exactly the en rows, lang reconstructed
    // from directory names
    val rows = q.select("id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "en"), (3L, "en")))
  }
}
