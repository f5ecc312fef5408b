package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring (the CCNet/KenLM-filter shape
  * reduced to its distributable core): fit corpus unigram frequencies in
  * one aggregation, score each document by its average negative
  * log-likelihood — low-perplexity ~ natural, high ~ noise/garbled. At
  * 100 TB both sides stay keyed joins: (doc, word) x (word -> logp) with
  * the vocabulary shuffled on the word key (broadcast only if small).
  */
object LmScore {

  /** Corpus unigram table: (word, n, logp) with logp = ln(n / total). */
  def unigramModel(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs.select(
      explode(TextOps.tokens(col(textCol))).as("word"))
    words.groupBy("word").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(words.agg(count(lit(1)).as("__t"))))
      .select(col("word"), col("n"),
        log(col("n") * 1.0 / col("__t")).as("logp"))
  }

  /** Held-out perplexity scoring (the deployable CCNet filter shape):
    * fit an ADD-ONE-SMOOTHED unigram model on a reference corpus, score
    * a disjoint target corpus — out-of-vocabulary tokens get the
    * smoothing mass ln((0+1)/(N+V)) instead of being dropped, so noisy
    * shards score high instead of silently shrinking. Plan: one token
    * aggregation over the reference, a 1-row (N, V) broadcast, and a
    * (token x vocab) keyed join on the target — every stage shuffles on
    * the word key and nothing is driver-side.
    */
  def holdoutScore(
      reference: DataFrame, target: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val counts = reference
      .select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val denom = counts.agg(sum("cnt").as("__n"), count(lit(1)).as("__v"))
    val logp = -log((coalesce(col("cnt"), lit(0L)) + 1) * 1.0 /
      (col("__n") + col("__v")))
    target
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(counts, Seq("word"), "left")
      .crossJoin(broadcast(denom))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("n_oov"),
        (sum(logp) / count(lit(1))).as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
  }

  /** Per-document scores against a fitted unigram model: word count,
    * average NLL, perplexity. Words absent from the model are dropped
    * (self-scored corpora have none; pass a smoothed model otherwise).
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame): DataFrame =
    docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(model.select("word", "logp"), Seq("word"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        (sum(-col("logp")) / count(lit(1))).as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
}
