package graft.queries

import graft.{GraftQuery, QueryPack, Tables}
import graft.split.Splits
import graft.text.Pii
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the reference's surface: PII
  * scrubbing and deterministic shard/shuffle manifests — the two passes
  * a training-data pipeline runs between quality filtering and packing.
  */
object CurationQueries extends QueryPack {

  /** PII detect + redact over the documents table. The synthetic corpus
    * carries no PII, so the query first APPENDS deterministic doc_id-
    * derived PII (one email, one IPv4, one phone per document — the same
    * string expression in both engines) and then runs the real
    * detect/redact pass; counts and the md5 of the redacted text are
    * hash-checked against DuckDB running the SAME regexes. PiiSpec covers
    * crafted edge cases; this gates the full-corpus plumbing.
    */
  val piiRedact: GraftQuery = GraftQuery(
    "pii_redact_docs",
    (s, dir) => {
      val injected = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com via 10.0."),
        (col("doc_id") % 256).cast("string"),
        lit(".7 tel +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), injected.as("__t"))
        .select(
          col("doc_id"),
          Pii.emailCount(col("__t")).cast("long").as("n_email"),
          Pii.ipCount(col("__t")).cast("long").as("n_ip"),
          Pii.phoneCount(col("__t")).cast("long").as("n_phone"),
          md5(Pii.redact(col("__t"))).as("red_md5"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH inj AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com via 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR)
                    || '.7 tel +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '${Pii.emailRe}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(t, '${Pii.ipv4Re}')) AS BIGINT)
               AS n_ip,
             CAST(len(regexp_extract_all(t, '${Pii.phoneRe}')) AS BIGINT)
               AS n_phone,
             md5(regexp_replace(regexp_replace(regexp_replace(t,
                   '${Pii.emailRe}', '[EMAIL]', 'g'),
                   '${Pii.ipv4Re}', '[IP]', 'g'),
                   '${Pii.phoneRe}', '[PHONE]', 'g')) AS red_md5
      FROM inj ORDER BY doc_id"""))

  /** Deterministic 64-shard global-shuffle manifest of the documents
    * table: (doc_id, shard, pos) with shard = seeded md5 hash mod 64 and
    * pos = hash-order rank within the shard — reproducible across runs
    * AND engines, parallel over shards.
    */
  val shardAssign: GraftQuery = GraftQuery(
    "shard_assign_docs",
    (s, dir) => Splits
      .shardAssign(
        Tables(s, dir, "documents").select("doc_id"), "doc_id", 64)
      .orderBy("doc_id"),
    Some("""
      WITH h AS (
        SELECT doc_id,
               CAST(concat('0x', substring(
                 md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 15)) AS BIGINT)
                 AS hv
        FROM documents)
      SELECT doc_id, hv % 64 AS shard,
             row_number() OVER (PARTITION BY hv % 64
                                ORDER BY hv, doc_id) AS pos
      FROM h ORDER BY doc_id"""))

  /** Deterministic per-group sampling: the k lowest-hash docs per lang
    * (seeded md5 order, doc_id tiebreak) — the "inspect k examples per
    * stratum" curation primitive, reproducible across runs and engines.
    * One window per group — scales like any hash-partitioned top-k.
    */
  val samplePerGroup: GraftQuery = GraftQuery(
    "sample_per_lang_docs",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy(graft.dedup.Dedup.md5Hash60(col("doc_id").cast("string"), 7),
          col("doc_id"))
      Tables(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rk")
    },
    Some("""
      SELECT lang, rk, doc_id, n_chars
      FROM (SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY CAST(concat('0x', substring(
                         md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 15))
                       AS BIGINT),
                       doc_id) AS rk
            FROM documents)
      WHERE rk <= 3 ORDER BY lang, rk"""))

  override def queries: Seq[GraftQuery] =
    Seq(piiRedact, shardAssign, samplePerGroup)
}
