package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005): a d×w grid of counters; item x increments cell (i, h_i(x)) for
  * each hash row i, and its frequency estimate is min_i cell(i, h_i(x)) —
  * always >= the true count, overestimating by <= 2N/w with probability
  * >= 1 - 2^-d.
  *
  * Scale design: building the sketch is ONE explode + ONE groupBy whose
  * result is a FIXED d*w cells regardless of corpus size — the
  * bounded-memory frequency primitive for 100-TB token statistics.
  * Sketches merge across shards/streams by cell-wise addition (the
  * groupBy is that merge). Probing broadcasts the tiny cell table.
  * Buckets come from the same seeded cross-engine md5-60 hash family as
  * MinHash (graft.dedup.Dedup.md5Hash60), so both the build and the
  * probe replay verbatim in DuckDB SQL.
  */
object CountMin {

  /** h_i(x) = md5_60(x || '|' || i) mod w — the per-row seeded bucket,
    * byte-identical to `Dedup.md5Hash60` with the row id as the seed.
    */
  def bucket(item: Column, row: Column, w: Int): Column =
    conv(substring(md5(concat(item, lit("|"), row.cast("string"))), 1, 15),
      16, 10).cast("long") % w

  /** Build the sketch: (r, bucket, cnt) — at most d*w rows.
    *
    * Occurrence counts are aggregated per DISTINCT item first (hash agg
    * with map-side combine), so the d seeded md5 buckets are computed
    * once per vocabulary entry, not once per occurrence — at sf10 that
    * is 4 hashes × ~100k distinct tokens instead of × 2.5B occurrences
    * (measured 211 s → the hash work was the entire cost). Cell counts
    * are identical either way: Σ per-bucket of per-item counts.
    */
  def cells(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame =
    items
      .select(col(itemCol).as("item"))
      .groupBy("item").agg(count(lit(1)).as("__n"))
      .select(col("item"), col("__n"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), bucket(col("item"), col("r"), w).as("bucket"),
        col("__n"))
      .groupBy("r", "bucket").agg(sum("__n").as("cnt"))

  /** Point-estimate every distinct item against a built sketch: melt to
    * (item, r, bucket), equi-join the broadcast cell grid, min over the d
    * rows. Every probed (r, bucket) cell exists whenever the item was in
    * the build set, so an inner join is exact for self-probing.
    */
  def estimates(
      items: DataFrame, itemCol: String, sketch: DataFrame, d: Int,
      w: Int): DataFrame =
    items.select(col(itemCol).as("item")).distinct()
      .select(col("item"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("item"), col("r"), bucket(col("item"), col("r"), w).as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("item").agg(min("cnt").as("est"))

  /** Heavy hitters: the top-k items of `items` by CMS estimate (est desc,
    * item asc — a total order, so cross-engine deterministic even where
    * collisions inflate ties).
    */
  def heavyHitters(
      items: DataFrame, itemCol: String, d: Int, w: Int, k: Int): DataFrame = {
    val sk = cells(items, itemCol, d, w)
    estimates(items, itemCol, sk, d, w)
      .select(col("item"), col("est"))
      .orderBy(desc("est"), col("item"))
      .limit(k)
  }

  /** STREAMING sketch maintenance: the same d×w cell grid kept as a
    * Structured Streaming aggregation over document text — streaming
    * state is bounded by d*w counters no matter how much data flows
    * through (which is why complete output mode needs no watermark), and
    * each micro-batch merges into the grid exactly like the cross-shard
    * cell-wise merge. The drained memory-sink cells then serve batch
    * probes identically to a batch-built sketch.
    *
    * SINK NOTE: the memory sink here is gate/test plumbing, not part of
    * the operator — the cell grid is a plain streaming aggregation, so a
    * production deployment points the same `cellStream` at any sink
    * (`foreachBatch` upsert into a store, kafka, files); the
    * driver-resident memory table is only the cheapest way to hand the
    * d*w rows (a few KB — state is fixed-size regardless of corpus) back
    * to the batch prober in one process. CountMinSpec pins sink
    * interchangeability by checking the drained grid cell-for-cell
    * against the batch-built sketch.
    */
  def streamingCells(
      spark: org.apache.spark.sql.SparkSession, sfDir: String, d: Int,
      w: Int, queryName: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = graft.sources.StreamRead.table(spark, sfDir, "documents", schema)
    val cellStream = docs
      .select(explode(split(col("text"), " ")).as("item"))
      .select(col("item"), explode(sequence(lit(0), lit(d - 1))).as("r"))
      .select(col("r"), bucket(col("item"), col("r"), w).as("bucket"))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val sq = cellStream.writeStream.format("memory").queryName(queryName)
      .outputMode("complete").start()
    try { sq.processAllAvailable(); graft.streaming.StreamMetrics.dump(sq) } finally sq.stop()
    spark.table(queryName)
  }
}
