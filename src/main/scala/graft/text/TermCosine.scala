package graft.text

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse bag-of-words cosine similarity over an inverted term index —
  * the document-similarity companion to Dedup.allPairsJaccard (multiset
  * counts instead of shingle sets; reference near-dup family, SURVEY
  * §2.9). Candidate generation joins postings of RARE terms only (global
  * document frequency <= dfCap), which bounds per-term fan-out at
  * dfCap^2 instead of |corpus|^2 — the stopword postings that would
  * dominate an unpruned self-join never join. Verification then computes
  * the EXACT full-vector cosine for each candidate pair: term-frequency
  * dot products and squared norms are integer sums (exact under any
  * partitioning/accumulation order); the only floating-point step is one
  * final division per pair.
  */
object TermCosine {

  /** (id, tok, tf) term-frequency postings. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("tf"))

  /** Top-k most-cosine-similar document pairs among candidates sharing
    * at least one rare term. Returns (id_a, id_b, dot, cosine) sorted by
    * cosine desc with (id_a, id_b) tiebreak.
    */
  def cosineTopK(
      postings: DataFrame, dfCap: Int, k: Int): DataFrame = {
    val norms = postings.groupBy("id")
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val rare = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
      .filter(col("df") <= dfCap)
      .select("id", "tok")
    val cand = rare.toDF("id_a", "tok")
      .join(rare.toDF("id_b", "tok"), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val dot = postings.toDF("id_a", "tok", "tf_a")
      .join(cand, Seq("id_a"))
      .join(postings.toDF("id_b", "tok", "tf_b"), Seq("id_b", "tok"))
      .groupBy("id_a", "id_b").agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    dot
      .join(norms.toDF("id_a", "n2_a"), Seq("id_a"))
      .join(norms.toDF("id_b", "n2_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("dot"),
        Q.r6(col("dot") / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
          .as("cosine"))
      .orderBy(desc("cosine"), col("id_a"), col("id_b"))
      .limit(k)
  }
}
