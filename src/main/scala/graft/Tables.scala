package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness-table catalog: deterministic TPC-H-ish parquet tables under
  * `/root/testdata/sf*` (see TESTDATA.md). All engine queries read through
  * here so the scan path (parquet + pushdown + pruning) is uniform.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
