package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level (substring) exact deduplication: find every k-token window
  * whose fingerprint occurs in more than one document, and measure how
  * much of each document those cross-document duplicate spans cover.
  *
  * This is the training-data dedup granularity below document-level
  * near-dup (MinHash in [[Dedup]]): two otherwise-distinct documents that
  * share a boilerplate paragraph are caught here, not there. Published
  * treatment: Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL 2022) — their suffix-array ExactSubstr pass; we
  * get the same detection semantics for a fixed window length k with a
  * pure shuffle-on-fingerprint plan (no suffix array, no global sort of
  * the corpus), which is the shape that survives 100 TB: one explode to
  * (id, pos, fp) — ~n_tokens rows, never materializing the text cross
  * product — one groupBy fp, one window per doc for interval union.
  *
  * The fingerprint is the first 60 bits of the window's md5, parsed to
  * BIGINT — [[Dedup.md5Hash60]]'s cross-engine contract, so the whole
  * pipeline replays verbatim in the DuckDB oracle. 60 bits admits the
  * same theoretical-collision trade every md5Hash60 pipeline in this
  * repo makes (expected collisions at 5B spans: single digits, each
  * marking one span spuriously duplicated in BOTH engines identically);
  * the narrow integer is what the corpus-wide shuffle carries — an
  * 8-byte key instead of a 32-char string on BOTH heavy exchanges (the
  * dup aggregation and the span join). Measured at sf100: 281.4→156.9 s
  * at the default 32 shuffle partitions, and the query LEFT the
  * needs-more-partitions sizing class — 256 partitions (the old best,
  * 173.0 s with string keys) now measures WORSE (207.5 s) because the
  * smaller payload no longer spills at 32 and extra partitions only add
  * partial-agg state to merge.
  */
object SpanDedup {

  /** One row per k-token window: (id, pos, fp). pos is 1-based token
    * position of the window start; documents shorter than k tokens emit
    * nothing. Tokenization is single-space split — the corpus contract
    * shared by every text operator in [[graft.text.TextOps]].
    */
  def spanFingerprints(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // compiled kernel (r16): tokens split on single spaces re-joined
    // with one space ARE the original byte span, so each window
    // fingerprint is one md5 over a byte range — no per-window
    // array_join allocation, no interpreted lambda, no hex-string
    // parse. Same fingerprints (TextHashKernelsSpec pins equality);
    // docs shorter than k tokens still emit nothing (empty array).
    df.select(
        col(idCol).as("id"),
        posexplode(graft.expressions.TextHashKernels
          .spanFps(col(textCol), k)).as(Seq("p0", "fp")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"), col("fp"))

  /** Fingerprints occurring in >= 2 distinct documents. One aggregation
    * keyed on the fingerprint — the only corpus-wide shuffle in the
    * pipeline, and it carries 32-char hashes, not text.
    */
  def duplicatedFingerprints(spans: DataFrame): DataFrame =
    spans.groupBy("fp")
      .agg(countDistinct("id").as("n_docs"), min("id").as("keep_id"))
      .filter(col("n_docs") >= 2)

  /** Per-document duplicate-span coverage: for every doc with at least
    * one cross-doc duplicate span, the number of token positions covered
    * by the union of its duplicate spans (spans overlap, so this is an
    * interval union via a running-max-end window — one partition per doc,
    * bounded by doc length) plus the share of those spans whose keeper
    * (min doc id over the fingerprint) is another document — the tokens
    * an ExactSubstr-style cut pass would actually remove here.
    *
    * Output: (id, n_tokens, n_spans, n_dup_spans, covered_tokens,
    * dup_frac, n_removable_spans).
    */
  def coverageReport(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spans = spanFingerprints(df, idCol, textCol, k)
    val dup = duplicatedFingerprints(spans)
    val dupSpans = spans.join(dup, "fp")
      .select(col("id"), col("pos"), (col("keep_id") =!= col("id")).as("removable"))

    val byDoc = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMaxEnd = max(col("pos") + (k - 1)).over(byDoc)
    val newlyCovered = greatest(
      lit(0L),
      col("pos") + (k - 1) -
        greatest(coalesce(prevMaxEnd, lit(0L)), col("pos") - 1))

    val perDoc = dupSpans
      .withColumn("nc", newlyCovered)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_dup_spans"),
        sum("nc").as("covered_tokens"),
        sum(when(col("removable"), 1L).otherwise(0L)).as("n_removable_spans"))

    val docLen = df.select(
      col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    perDoc.join(docLen, "id")
      .select(
        col("id"),
        col("n_tokens"),
        greatest(col("n_tokens") - (k - 1), lit(0L)).as("n_spans"),
        col("n_dup_spans"),
        col("covered_tokens"),
        graft.Q.r6(col("covered_tokens") / col("n_tokens")).as("dup_frac"),
        col("n_removable_spans"))
  }
}
