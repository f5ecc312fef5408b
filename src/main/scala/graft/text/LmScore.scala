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
