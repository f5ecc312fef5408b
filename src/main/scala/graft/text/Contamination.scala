package graft.text

import graft.Q
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection for pre-training corpora: the
  * fraction of a benchmark document's distinct word n-grams that appear
  * in a corpus document (the n-gram-overlap decontamination protocol of
  * GPT-3 appendix C / Dodge et al. 2021's C4 analysis — distinct from
  * near-dup LSH, which bounds whole-document similarity; contamination
  * flags partial containment of a SMALL protected set).
  *
  * Scale shape: the benchmark side is tiny by construction (eval sets),
  * so the gram join broadcasts it; the corpus side is one explode +
  * distinct keyed by (doc, gram). No pairwise comparison ever
  * materializes beyond grams actually shared.
  */
object Contamination {

  /** Distinct word n-grams per row as (idCol, gram) — gram = n tokens
    * joined by a single space (pure array expressions, no UDF).
    */
  def ngramSet(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // compiled byte-span windows (r16): SpanGrams returns [] for docs
    // shorter than n tokens — the same guard the composed form needed
    // against sequence(1, 0)'s descending [1, 0]
    df.select(
      col(idCol),
      explode(array_distinct(graft.expressions.TextHashKernels
        .spanGrams(col(textCol), n))).as("gram"))

  /** (bench doc, corpus doc) pairs whose shared distinct-gram count is
    * >= minFrac of the bench doc's grams. Output: bench_id, corpus_id,
    * shared, overlap_frac.
    */
  def overlap(
      corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minFrac: Double): DataFrame = {
    val cg = ngramSet(corpus, idCol, textCol, n)
      .toDF("corpus_id", "gram")
    val bg = ngramSet(bench, idCol, textCol, n)
      .toDF("bench_id", "gram")
    val bt = bg.groupBy("bench_id").agg(count(lit(1)).as("__n_grams"))
    cg.join(broadcast(bg), Seq("gram"))
      .groupBy("bench_id", "corpus_id")
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(bt), Seq("bench_id"))
      .filter(col("shared") * 1.0 / col("__n_grams") >= minFrac)
      .select(
        col("bench_id"), col("corpus_id"), col("shared"),
        Q.r6(col("shared") * 1.0 / col("__n_grams")).as("overlap_frac"))
  }
}
