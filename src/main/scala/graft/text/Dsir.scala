package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169): fit hashed-n-gram bag-of-words models on a TARGET
  * slice and on the RAW corpus, score every raw document by the
  * log-likelihood ratio of the two, then select either the top-k by
  * weight or a Gumbel top-k sample (which draws WITHOUT replacement with
  * probability proportional to the importance ratio — the paper's
  * resampling step, made deterministic here by a seeded-md5 uniform).
  *
  * 100-TB shape: the featurizer is one linear explode (unigrams +
  * bigrams, hashed into a FIXED bucket space — no vocabulary state, no
  * shuffle-heavy distinct); the model fit is a map-side-combinable
  * groupBy over at most [[Buckets]] keys; scoring broadcasts the
  * ≤[[Buckets]]-row model back and sums per doc. Nothing in the chain
  * grows with corpus size except the two linear passes, which is what
  * makes hashed DSIR the standard pretraining-selection pass at corpus
  * scale (the paper runs it on the Pile).
  *
  * Cross-engine determinism: bucket counts are exact Longs; the per-
  * bucket log-ratio is ONE `ln` of a double ratio whose operands are
  * bit-identical in both engines (add-one smoothing, products taken in
  * double), quantized half-away to integer micro-units (the WoE/JSD
  * precedent); per-document weights are then exact integer SUMs of the
  * bucket micro values, immune to accumulation order.
  */
object Dsir {
  /** Fixed hashed feature space (the paper uses 10k; 4096 keeps the
    * broadcast model trivially small while leaving hash collisions rare
    * on the synthetic vocabulary).
    */
  val Buckets = 4096

  /** Seed for the gram-bucket hash. */
  val HashSeed = 11

  /** Seed for the Gumbel uniforms. */
  val GumbelSeed = 23

  private val BucketsD = Buckets.toDouble

  /** Signed half-away-from-zero micro-unit quantization (matches DuckDB
    * `CASE WHEN x >= 0 THEN floor(x*1e6+0.5) ELSE -floor(-x*1e6+0.5) END`).
    */
  private def microSigned(c: Column): Column =
    when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5))
      .cast("long")

  /** One row per unigram/bigram OCCURRENCE: (idCol, keep..., bucket).
    * A single explode of the concatenated unigram + bigram arrays — the
    * whole featurizer is one narrow projection.
    */
  def hashedGrams(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      keep: Seq[String]): DataFrame =
    // compiled kernel (r16): buckets computed per row in one pass (one
    // digest per gram over byte slices of the original string), so the
    // Generate fans out longs instead of gram strings and no interpreted
    // per-gram hash chain runs post-explode. Same grams, same seeded
    // md5-60bit % Buckets values (TextHashKernelsSpec pins equality).
    docs.select(
      (col(idCol) +: keep.map(col)) :+
        explode(graft.expressions.TextHashKernels
          .gramBuckets(col(textCol), HashSeed, Buckets)).as("bucket"): _*)

  /** Per-bucket micro log-ratio model fit from a hashed-gram frame:
    * `lr = ln(((ct+1)*(nr+B)) / ((cr+1)*(nt+B)))` where ct/cr are the
    * bucket's occurrence counts in the target slice / raw corpus and
    * nt/nr the corpus totals — add-one-smoothed target log-prob minus
    * raw log-prob, as one `ln` of one double ratio. Output:
    * (bucket, lr_micro), ≤ [[Buckets]] rows.
    */
  def fitModel(grams: DataFrame, targetPred: Column): DataFrame = {
    val w = Window.partitionBy()
    grams
      .groupBy("bucket")
      .agg(
        sum(when(targetPred, 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .withColumn("nt", sum("ct").over(w))
      .withColumn("nr", sum("cr").over(w))
      .select(
        col("bucket"),
        microSigned(log(
          ((col("ct") + 1.0) * (col("nr") + BucketsD)) /
            ((col("cr") + 1.0) * (col("nt") + BucketsD)))).as("lr_micro"))
  }

  /** Per-document importance weights: exact integer sum of the bucket
    * micro log-ratios over every gram occurrence in the document. The
    * model side is ≤ [[Buckets]] rows — always broadcast.
    * Output: (idCol, keep..., n_grams, weight_micro).
    */
  def docWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      keep: Seq[String],
      targetPred: Column): DataFrame = {
    val grams = hashedGrams(docs, idCol, textCol, keep)
    // The model is <= Buckets rows by construction — collect it (the
    // same bounded-driver-state class as bin edges and k-means
    // centroids) and score each document IN ONE PROJECTION: per-row
    // bucket array -> integer sum of map-literal lookups. The r15 shape
    // exploded every gram occurrence a second time and shuffled the
    // per-occurrence frame through a broadcast join + per-doc
    // re-aggregation; scoring is a pure map now (guide §2.4). The md5
    // per occurrence is unchanged (scoring must hash its grams either
    // way); weight_micro is an exact integer sum over the same
    // occurrence multiset, so results are bit-identical and
    // accumulation-order free.
    val byBucket = fitModel(grams, targetPred).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dense array literal indexed by bucket: element_at on an array is
    // O(1) where a map literal's GetMapValue is a linear key scan —
    // 4096 entries per lookup would dwarf the hashing itself. Buckets
    // absent from the corpus-fit model carry 0 (they can't occur in the
    // same corpus being scored; 0 keeps the sum identity exact even so).
    val modelArr = typedLit(
      (0 until Buckets).map(b => byBucket.getOrElse(b.toLong, 0L)))
    val words = split(col(textCol), " ")
    val n1 = greatest(size(words) - 1, lit(0))
    val bigrams = zip_with(
      slice(words, lit(1), n1), slice(words, lit(2), n1),
      (a: Column, b: Column) => concat(a, lit(" "), b))
    val buckets = transform(
      concat(words, bigrams),
      g => graft.dedup.Dedup.md5Hash60(g, HashSeed) % Buckets)
    docs.select(
      (col(idCol) +: keep.map(col)) :+
        size(buckets).cast("long").as("n_grams") :+
        aggregate(buckets, lit(0L),
          (acc, b) => acc + element_at(modelArr, (b + 1).cast("int")))
          .as("weight_micro"): _*)
  }

  /** Deterministic Gumbel key for proportional sampling without
    * replacement: `weight_micro + micro(-ln(-ln(u)))` with `u` a seeded
    * md5 uniform in (0,1). Taking the top-k by this key IS sampling k
    * docs with probability proportional to the importance ratio
    * (Gumbel-top-k), but reproducibly across engines.
    */
  def gumbelKey(idCol: Column): Column = {
    val u = (Dedup.md5Hash60(idCol.cast("string"), GumbelSeed) + 0.5) /
      1152921504606846976.0 // 2^60
    microSigned(-log(-log(u)))
  }
}
