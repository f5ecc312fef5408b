package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources/sinks matching the reference's I/O surface (SURVEY §2.1).
  *
  * S1: CSV scan with an explicit schema — never inferSchema in the engine
  * (double scan + nondeterministic type promotion; SURVEY §1.3).
  * S2: submission sink — header, no index column
  * (house_predict.py:622-628). `coalesce(1)` mirrors the reference's
  * single-file contract; drop it for sharded big outputs.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Parity helper for ad-hoc exploration only. */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeSubmissionCsv(
      df: DataFrame, path: String, cols: Seq[String] = Seq("id", "label"),
      singleFile: Boolean = true): Unit = {
    val out = df.select(cols.head, cols.tail: _*)
    (if (singleFile) out.coalesce(1) else out)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** JSONL (newline-delimited JSON) scan with an explicit schema — the
    * interchange format real document corpora ship in. Schema-on-read is
    * mandatory for the same reason as S1: inference double-scans and
    * type-promotes nondeterministically, and at corpus scale a JSON
    * inference pass over 100 TB is a full extra read.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Sharded JSONL sink (one object per line per row). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC scan/sink — the second columnar format Spark ships natively;
    * typed round-trip like parquet (predicate pushdown + column pruning
    * both apply, same as the parquet path).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
