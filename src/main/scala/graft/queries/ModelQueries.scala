package graft.queries

import graft.{GraftQuery, Q, QueryPack, Tables}
import graft.metrics.Metrics
import graft.model.Models
import graft.multimodal.MediaOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib model + multimodal-plumbing queries. Model training is
  * rows-only (not SQL-expressible); the media-metadata stub is fully
  * oracle-checked because the fake decode is deterministic arithmetic on
  * the blob length.
  */
object ModelQueries extends QueryPack {

  private def labeled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_quantity"), col("l_discount"), col("l_tax"),
      col("l_extendedprice"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("label"))

  private val feats = Seq("l_quantity", "l_discount", "l_tax", "l_extendedprice")

  /** Multimodal: opaque binary column -> typed metadata via partition-wise
    * stub decode; oracle mirrors the deterministic fake arithmetic.
    */
  val mediaMeta: GraftQuery = GraftQuery(
    "media_metadata_stub",
    (s, dir) => MediaOps.decodeMetadata(
        Tables(s, dir, "documents").select(
          col("doc_id"), col("text").cast("binary").as("media")),
        "doc_id", "media")
      .toDF().orderBy("media_id"),
    Some("""
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS byte_len,
             octet_length(encode(text)) % 640 AS width,
             (octet_length(encode(text)) * 7) % 480 AS height,
             octet_length(encode(text)) * 3 AS duration_ms
      FROM documents ORDER BY media_id"""))

  /** Multimodal frame-sampling plumbing, CONTENT-hash-checked: the
    * row-expanding stub decode (every 4th 32-byte chunk of the blob
    * stands in for a keyframe) with each frame's md5 compared against a
    * DuckDB replay on text substrings — byte-identical because the
    * corpus is ASCII. This pins the 1->many decode shape AND the exact
    * frame boundaries, not just row counts.
    */
  val mediaFrames: GraftQuery = GraftQuery(
    "media_frames_hashed",
    (s, dir) => MediaOps.sampleFrames(
        Tables(s, dir, "documents").select(
          col("doc_id"), col("text").cast("binary").as("media")),
        "doc_id", "media", everyN = 4, frameSize = 32)
      .toDF()
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_id"),
        md5(col("frame_bytes")).as("frame_md5"))
      .orderBy("media_id", "frame_id"),
    Some("""
      WITH g AS (
        SELECT doc_id, text,
               unnest(generate_series(0,
                 CAST(ceil(length(text) / 32.0) AS BIGINT) - 1)) AS i
        FROM documents)
      SELECT doc_id AS media_id, i AS frame_id,
             md5(substring(text, CAST(i * 32 + 1 AS INTEGER), 32))
               AS frame_md5
      FROM g WHERE i % 4 = 0 ORDER BY media_id, frame_id"""))

  /** M10: balanced random forest, hash-split 80/20, evaluated with
    * accuracy + macro-F1 + AUC (rows-only).
    */
  val rfEval: GraftQuery = GraftQuery(
    "rf_train_eval",
    (s, dir) => {
      val d = labeled(s, dir)
      val train = d.filter(pmod(col("l_orderkey"), lit(5)) =!= 0)
      val valid = d.filter(pmod(col("l_orderkey"), lit(5)) === 0)
      val model = Models.randomForest(feats, "label", numTrees = 5,
        maxDepth = 4).fit(Models.withBalancedWeights(train, "label"))
      val scored = model.transform(valid).select(
        col("label"), col("prediction").cast("long").as("pred"))
      Metrics.macroAvg(scored, "label", "pred")
        .crossJoin(Metrics.accuracy(scored, "label", "pred"))
    },
    None)

  /** M7: L1 feature selection — surviving features + coefficients.
    * Runs on a deterministic 10% hash sample: feature SELECTION (which
    * coefficients are nonzero) is a population-level property the sample
    * preserves — ModelsSpec pins sample-vs-full selected-feature equality
    * and keeps the full-data path covered; the solver cost (elasticNet=1
    * iterations) scales with rows, so the registered query stays a plan
    * check instead of a solver benchmark.
    */
  val l1Select: GraftQuery = GraftQuery(
    "l1_feature_selection",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      // coalesce the thin sample: the L1 solver (OWLQN) runs ~25 passes,
      // and 32 tasks of ~2k rows each per pass is pure scheduling
      // overhead — 8 partitions keeps task size proportional to the data
      val sampled = graft.split.Splits.hashSample(
        labeled(s, dir), col("l_orderkey"), pct = 10).coalesce(8)
      Models.l1FeatureSelection(sampled, feats, "label", regParam = 0.001)
        .map { case (f, c) => (f, Q.r6Double(c)) }
        .toDF("feature", "coef").orderBy("feature")
    },
    None)

  /** M12: 3-model comparison report on sf data (rows-only). */
  val comparison: GraftQuery = GraftQuery(
    "model_comparison",
    (s, dir) => {
      val d = labeled(s, dir)
      val train = d.filter(pmod(col("l_orderkey"), lit(5)) =!= 0)
      val valid = d.filter(pmod(col("l_orderkey"), lit(5)) === 0)
      Models.comparisonReport(train, valid, "label", Seq(
        "logreg" -> Models.logReg(feats, "label"),
        "random_forest" -> Models.randomForest(feats, "label", numTrees = 5,
          maxDepth = 4),
        "gbt" -> Models.gbt(feats, "label", maxIter = 5, maxDepth = 3)))
    },
    None)

  override def queries: Seq[GraftQuery] = Seq(
    mediaMeta, mediaFrames, rfEval, l1Select, comparison)
}
