package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Streaming file-source read of `sfDir/<table>.parquet` that handles
  * BOTH table layouts in play: the driver's single parquet FILE directly
  * under sfDir (the file-stream source requires a directory path, so
  * point it at sfDir and glob-filter down to the one file), and the
  * scale rungs' DIRECTORY of part files written by Spark/ScaleUp (point
  * at it directly). Using the glob form against the directory layout
  * matches nothing and silently streams an EMPTY source — a timing that
  * looks impossibly fast and a result that is wrong, not failing.
  */
object StreamRead {
  /** NOTE: the layout probe is a local-filesystem check because the
    * harness data is local. On an object store / HDFS deployment tables
    * are always directory-shaped — pass the directory path straight to
    * `readStream.parquet` (the single-file + glob form exists only for
    * the harness's single-file driver tables).
    */
  def table(
      spark: SparkSession, sfDir: String, name: String,
      schema: StructType): DataFrame = {
    val base = s"$sfDir/$name.parquet"
    if (new java.io.File(base).isDirectory)
      spark.readStream.schema(schema).parquet(base)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$name.parquet")
        .parquet(sfDir)
  }
}
