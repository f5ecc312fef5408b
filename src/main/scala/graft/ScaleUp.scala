package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for scale testing: replicates every
  * fact table of an existing sf directory `factor` times into DISJOINT
  * key universes (every key column shifted by `copy * STRIDE`), leaving
  * `region`/`nation` fixed — the same shape TPC-H uses when sf grows
  * (dimension row counts scale, the nation/region vocabulary does not).
  * Per-key cardinalities are preserved exactly (a customer still has
  * the same orders), so join/agg selectivities match the source scale
  * and only the data VOLUME grows.
  *
  * Two fact tables get a deterministic per-copy perturbation so
  * content-addressed operators see new content instead of 10 exact
  * clones (which would inflate every dedup cluster by `factor`):
  * documents append a short copy tag (n_chars recomputed), embeddings
  * nudge one coordinate per copy. Copy 0 is byte-identical to the
  * source.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> [factor]
  */
object ScaleUp {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // dimensions that do not scale
    write(read("region"), "region")
    write(read("nation"), "nation")

    def copies(t: String)(remap: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until factor).map(c => remap(base, c)).reduce(_ unionAll _), t)
    }
    def shift(c: Int)(k: org.apache.spark.sql.Column) = k + lit(c * Stride)

    copies("customer") { (d, c) =>
      d.withColumn("c_custkey", shift(c)(col("c_custkey")))
    }
    copies("supplier") { (d, c) =>
      d.withColumn("s_suppkey", shift(c)(col("s_suppkey")))
    }
    copies("part") { (d, c) =>
      d.withColumn("p_partkey", shift(c)(col("p_partkey")))
    }
    copies("orders") { (d, c) =>
      d.withColumn("o_orderkey", shift(c)(col("o_orderkey")))
        .withColumn("o_custkey", shift(c)(col("o_custkey")))
    }
    copies("lineitem") { (d, c) =>
      d.withColumn("l_orderkey", shift(c)(col("l_orderkey")))
        .withColumn("l_partkey", shift(c)(col("l_partkey")))
        .withColumn("l_suppkey", shift(c)(col("l_suppkey")))
    }
    // `events` is intentionally absent: the driver has written its `ts`
    // with TIMESTAMP(NANOS) (Spark reads it only via the nanosAsLong
    // legacy flag and cannot write it back) and TIMESTAMP(MICROS)
    // physical types. The companion dev tool `tools/scale_events.py`
    // replicates the file with pyarrow, preserving whichever physical
    // type the source has — EventOps normalizes both on read.
    copies("documents") { (d, c) =>
      val txt = if (c == 0) col("text") else concat(col("text"), lit(s" v$c"))
      d.withColumn("doc_id", shift(c)(col("doc_id")))
        .withColumn("text", txt)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    copies("embeddings") { (d, c) =>
      val emb =
        if (c == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          when(i === lit(c % 64), x + lit((0.001f * (c + 1)).toFloat))
            .otherwise(x))
      d.withColumn("vec_id", shift(c)(col("vec_id")))
        .withColumn("embedding", emb)
    }

    println(s"scaled $src -> $dst x$factor")
    spark.stop()
  }
}
