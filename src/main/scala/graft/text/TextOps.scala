package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, heuristic language ID, document
  * fingerprinting. All pure Catalyst expressions (codegen'd, no UDFs) so
  * they run at full scan speed over 100 TB of documents.
  *
  * Token ops assume single-space-normalized text (the `documents` table
  * guarantee); pass a normalized column otherwise.
  */
object TextOps {

  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Exact occurrences of one token (list-filter, not regex — overlap-safe). */
  def countToken(c: Column, token: String): Column =
    size(filter(tokens(c), x => x === lit(token)))

  def countTokens(c: Column, toks: Seq[String]): Column =
    toks.map(countToken(c, _)).reduce(_ + _)

  /** Mean token length for single-space text: (chars - separators)/tokens. */
  def avgTokenLen(c: Column): Column = {
    val nt = tokenCount(c)
    (length(c) - (nt - lit(1))) * 1.0 / nt
  }

  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    countTokens(c, stopwords) * 1.0 / tokenCount(c)

  /** Composite quality score in [0,1]: length, non-stopword share, token
    * length — the shape of the reference-style rule scoring
    * (data_analysis.ipynb cell 8 risk flags), adapted to documents.
    */
  def qualityScore(c: Column, stopwords: Seq[String]): Column =
    lit(0.4) * least(length(c) / 500.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - stopwordRatio(c, stopwords)) +
      lit(0.3) * least(avgTokenLen(c) / 8.0, lit(1.0))

  /** Gopher-style document quality rules (Rae et al. 2021, adapted to
    * this corpus): five boolean per-doc gates — token-count bounds, mean
    * token length bounds, symbol-character ratio, stopword presence, and
    * top-token repetition share. One narrow projection plus a per-doc
    * token aggregation; every ratio is a double over exact integer
    * counts, so the rules replay verbatim in SQL.
    *
    * @return (idCol, r_word_count, r_mean_word_len, r_symbol_ratio,
    *         r_stopword, r_repetition)
    */
  def gopherRules(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val base = df.select(
      col(idCol),
      tokenCount(t).as("__nt"),
      avgTokenLen(t).as("__awl"),
      stopwordRatio(t, stopwords).as("__stopr"),
      length(regexp_replace(t, "[a-zA-Z0-9 ]", "")).as("__nsym"),
      length(t).as("__len"))
    val top = df
      .select(col(idCol), explode(tokens(t)).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(max("__c").as("__maxc"))
    // LEFT join + coalesce-to-false: a zero-token document has no row in
    // the token aggregate, and as a quality filter it must be REPORTED
    // as failing every rule, not silently dropped. The division guards
    // keep length-0 text from yielding null ratios.
    def rule(c: Column) = coalesce(c, lit(false))
    base.join(top, Seq(idCol), "left").select(
      col(idCol),
      rule(col("__nt").between(5, 10000)).as("r_word_count"),
      rule(col("__awl").between(3.0, 10.0)).as("r_mean_word_len"),
      rule(when(col("__len") > 0,
        col("__nsym").cast("double") / col("__len") < 0.1))
        .as("r_symbol_ratio"),
      rule(col("__stopr") > 0.01).as("r_stopword"),
      rule(when(col("__nt") > 0,
        col("__maxc").cast("double") / col("__nt") < 0.2))
        .as("r_repetition"))
  }

  /** Marker-token language scores; argmax with alphabetical tie-break.
    * A deterministic n-gram-style heuristic (real marker lists would come
    * from per-language frequency profiles).
    */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("hash", "merge"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "sort"),
    "fr" -> Seq("query", "window"),
    "zh" -> Seq("spark", "stream"))

  def langId(
      c: Column,
      markers: Seq[(String, Seq[String])] = defaultMarkers): Column = {
    val scores = markers.map { case (lang, toks) => lang -> countTokens(c, toks) }
    // alphabetical langs win ties: lang_i wins iff score_i >= all later
    val preds = scores.zipWithIndex.init.map { case ((lang, s), i) =>
      (lang, scores.drop(i + 1).map(_._2).map(s >= _).reduce(_ && _))
    }
    preds.foldRight(lit(scores.last._1): Column) { case ((lang, cond), e) =>
      when(cond, lit(lang)).otherwise(e)
    }
  }

  /** 64-bit hex fingerprint: md5 prefix (cross-engine stable). */
  def fingerprintMd5(c: Column): Column =
    substring(md5(c.cast("binary")), 1, 16)

  /** BPE-style pretokenization: letter runs, digit runs, and punctuation
    * runs (each with an optional leading space) — the GPT-2 pretokenizer
    * shape minus its lookahead, so the pattern means the same thing to
    * Java regex (Spark) and RE2 (DuckDB). Alternatives are disjoint
    * character classes, so alternation-order semantics can't diverge.
    */
  val bpePattern = " ?[a-z]+| ?[A-Z][a-z]*| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(bpePattern), lit(0))

  /** Pretoken count — the standard proxy for LLM token cost (whitespace
    * count under-reports punctuation/number splits).
    */
  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Sliding-window token chunks: `chunkSize` tokens per chunk, the last
    * `overlap` tokens shared with the next chunk — the LLM
    * context-window splitting primitive. Returns array<array<string>>
    * (posexplode for (chunk_id, chunk) rows). Pure array expressions —
    * codegen'd, explode-parallel, no UDF; a doc always yields >= 1 chunk
    * and the final chunk is truncated at the end of the doc.
    */
  def chunkTokens(c: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got ($chunkSize, $overlap)")
    val stride = chunkSize - overlap
    val toks = tokens(c)
    val n = size(toks)
    // 1 + ceil((n - chunkSize) / stride) for n > chunkSize, else 1.
    // Double division of ints is correctly rounded, so ceil is exact here.
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      ceil((n - chunkSize).cast("double") / stride).cast("int") + 1)
    transform(sequence(lit(0), nChunks - 1),
      i => slice(toks, i * stride + 1, lit(chunkSize)))
  }

  /** Curation-grade text normalization: strip HTML-ish tags, replace
    * ASCII control characters with spaces, collapse whitespace runs,
    * trim. Pure codegen'd regexp projections — the Common-Crawl-style
    * first cleaning pass, runnable at full scan speed. Regexes use
    * explicit character classes only (no `\s`): Java regex (Spark) and
    * RE2 (DuckDB) disagree on shorthand-class membership (`\x0B`), but
    * agree exactly on these literals.
    */
  def cleanText(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val noCtrl = regexp_replace(noTags, "[\\x00-\\x1f\\x7f]", " ")
    trim(regexp_replace(noCtrl, "  +", " "))
  }

  /** Per-document word-trigram novelty: for each doc (id, grouping
    * columns), the count of its DISTINCT trigrams and how many of them
    * make their FIRST corpus appearance (min id) in that doc — the
    * freshness diagnostic for incremental dumps (an exact re-crawl
    * scores 0 novel, brand-new text scores all-novel). Docs with < 3
    * tokens carry no trigram and drop out. Linear shape: one distinct
    * (id, gram) explode, a map-side-combinable min(id) per gram, and a
    * join back on the gram key the aggregate is already partitioned by.
    *
    * @return one row per doc: (groupCols..., idCol, total, novel)
    */
  def gramNovelty(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    // compiled byte-span windows + PER-ROW dedup (r16): grams of a doc
    // were exploded via an interpreted concat_ws lambda and deduped with
    // a frame-level distinct — an exchange carrying every gram STRING
    // occurrence. array_distinct per row is the same dedup (idCol is in
    // every row), so that exchange disappears and the explode emits the
    // distinct set directly; docs under 3 tokens yield an empty array,
    // exactly what the old size filter excluded.
    val g = df
      .select(
        col(idCol) +: groupCols.map(col) :+
          explode(array_distinct(graft.expressions.TextHashKernels
            .spanGrams(col(textCol), 3))).as("gram"): _*)
    val first = g.groupBy("gram").agg(min(idCol).as("first_doc"))
    g.join(first, "gram")
      .groupBy(idCol, groupCols: _*)
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L))
          .as("novel"))
  }
}
