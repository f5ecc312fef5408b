package graft.dedup

import graft.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), character-shingle Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: everything reduces through groupBy/join on
  * shingle/signature keys — no driver-side collection, no cross joins of
  * raw documents. MinHash-LSH turns the O(n²) pair problem into a
  * band-bucket equi-join; SimHash compresses each doc to 63 bits.
  */
object Dedup {

  /** Seeded 64-bit document hash — Spark-native xxhash64; the fast default
    * for production pipelines (engine-internal, so rows-only checkable).
    */
  val xxHash: (Column, Int) => Column = (c, seed) => xxhash64(c, lit(seed))

  /** Seeded 60-bit cross-engine hash: first 15 hex chars of a seeded md5,
    * parsed base-16. Bit-identical to DuckDB
    * `CAST(concat('0x', substring(md5(s || '|' || seed), 1, 15)) AS BIGINT)`,
    * which makes MinHash/SimHash pipelines fully DuckDB-oracle-checkable.
    * ~3x the CPU of xxhash64 — still a per-token projection that scales.
    */
  val md5Hash60: (Column, Int) => Column = (c, seed) =>
    conv(substring(md5(concat(c, lit("|" + seed))), 1, 15), 16, 10)
      .cast("long")

  /** Modulus for the universal-hash permutation family: the Mersenne
    * prime 2^31-1. Keeps a*(h mod p)+b under 2^62, so the arithmetic is
    * exact in both Spark (wrapping) and DuckDB (overflow-checked) BIGINT.
    */
  val P31 = 2147483647L

  /** Deterministic (a_i, b_i) pairs for the permutation family
    * h_i = (a_i * h + b_i) mod P31, a_i in [1, P31-1], b_i in [0, P31-1].
    */
  def permConstants(n: Int): Seq[(Long, Long)] = (0 until n).map { i =>
    val a = ((1103515245L * (i + 1) + 12345L) % (P31 - 1)) + 1L
    val b = (1000003L * i + 12345L) % P31
    (a, b)
  }

  /** Unseeded 60-bit md5 base hash reduced mod P31 — ONE md5 per input;
    * the permutations above fan it out arithmetically. Cross-engine:
    * DuckDB `CAST(concat('0x', substring(md5(s),1,15)) AS BIGINT) % P31`.
    */
  def md5Base(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P31

  /** Exact duplicate groups by an arbitrary key expression: group size and
    * kept (minimum) id per group with >1 member.
    */
  def exactDupGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))
      .filter(col("n") > 1)

  /** Deduplicated table: keep the lowest-id row per key (one shuffle —
    * the actual "drop duplicates" companion to `exactDupGroups`).
    */
  def dedupKeepFirst(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct character k-shingles, one row per (id, shingle). */
  def shingleSet(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), explode(shingleArray(textCol, k)).as("sh"))

  /** Exact Jaccard for given candidate id pairs (pairs with empty
    * intersection are dropped — they'd be 0 anyway).
    * `pairs` must have columns (id_a, id_b).
    */
  def jaccardForPairs(shingles: DataFrame, pairs: DataFrame): DataFrame = {
    val a = shingles.toDF("id_a", "sh")
    val b = shingles.toDF("id_b", "sh")
    val sz = shingles.toDF("id", "sh")
      .groupBy("id").agg(count(lit(1)).as("n"))
    val inter = a.join(pairs, Seq("id_a"))
      .join(b, Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sz.toDF("id_a", "n_a"), Seq("id_a"))
      .join(sz.toDF("id_b", "n_b"), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        Q.r6(col("inter") * 1.0 / (col("n_a") + col("n_b") - col("inter")))
          .as("jaccard"))
  }

  /** Cross-group duplicate "leakage matrix": for every unordered pair of
    * groups (corpus sources, train/eval shards), the number of duplicate
    * DOC PAIRS sharing a fingerprint key — the shard-contamination
    * report run before a training/eval split ships. Counting happens on
    * the (key, group)->count frame, so the join is over dup-group
    * cardinalities, never raw documents: within-group pairs are
    * c*(c-1)/2, cross-group pairs c_a*c_b — all exact integers.
    */
  def dupLeakageMatrix(
      df: DataFrame, key: Column, groupCol: String): DataFrame = {
    val g = df.groupBy(key.as("fp"), col(groupCol).as("grp"))
      .agg(count(lit(1)).as("c"))
    g.toDF("fp", "grp_a", "c_a")
      .join(g.toDF("fp", "grp_b", "c_b"), Seq("fp"))
      .filter(col("grp_a") <= col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        when(col("grp_a") === col("grp_b"),
          expr("c_a * (c_a - 1) div 2")).otherwise(col("c_a") * col("c_b"))
          .as("pairs"))
      .groupBy("grp_a", "grp_b").agg(sum("pairs").as("dup_pairs"))
      .filter(col("dup_pairs") > 0)
      .orderBy("grp_a", "grp_b")
  }

  /** EXACT all-pairs Jaccard >= t via prefix filtering (the AllPairs /
    * PPJoin candidate scheme, Bayardo et al. WWW'07 shape): order each
    * set's shingles by ascending global document frequency (rarest
    * first, shingle tiebreak), keep only the first
    * `|S| - ceil(t*|S|) + 1` as the set's PREFIX, and equi-join prefixes
    * on the shingle. Lossless: J(A,B) >= t implies the globally-smallest
    * shared shingle sits inside BOTH prefixes (else one side would have
    * more than `|S| - t*|S|` exclusive shingles before it, capping the
    * intersection below `t*|S|`). So candidate generation never goes
    * all-pairs — rare shingles drive the join and frequency-heavy
    * shingles never fan out — and exact Jaccard verification runs on
    * candidates only. Plan: one frequency agg, one per-set sort window
    * (partitioned by id — never a global rank), one prefix equi-join,
    * then `jaccardForPairs`.
    */
  def allPairsJaccard(
      shingles: DataFrame, threshold: Double): DataFrame = {
    // Four consumers read the shingle frame (frequency agg, prefix rank,
    // and both sides of the verification join): localCheckpoint
    // materializes the explode once and frees its lineage — blocks are
    // released with the RDD, no caller-managed unpersist needed.
    val df = shingles.toDF("id", "sh").localCheckpoint()
    val freq = df.groupBy("sh").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("id").orderBy("df", "sh")
    val ranked = df.join(freq, Seq("sh"))
      .select(col("id"), col("sh"), row_number().over(wDoc).as("pos"),
        count(lit(1)).over(Window.partitionBy("id")).as("n"))
    val prefix = ranked
      .filter(col("pos") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("id", "sh")
    val cand = prefix.toDF("id_a", "sh")
      .join(prefix.toDF("id_b", "sh"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    jaccardForPairs(df, cand).filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: numHashes seeded hash permutations, min per
    * doc. Returns (id, sig array<long>) — sig(i) uses seed i. `hashFn`
    * defaults to xxhash64; pass `md5Hash60` for oracle-checkable output.
    */
  def minhashSignatures(
      shingles: DataFrame, numHashes: Int,
      hashFn: (Column, Int) => Column = xxHash): DataFrame = {
    // all permutations as parallel min-aggregations in ONE pass over the
    // shingles (no seed cross-join, one shuffle on id)
    val aggs = (0 until numHashes).map(i =>
      min(hashFn(col("sh"), i)).as(s"__m$i"))
    shingles.toDF("id", "sh")
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(
        col("id"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** MinHash via the universal-hash permutation family over ONE md5 base
    * hash per shingle: h_i = (a_i*h + b_i) mod P31. 32x fewer hash
    * evaluations than hashing per seed, and every step is expressible in
    * DuckDB SQL verbatim — the oracle-checkable production path.
    */
  def minhashSignaturesPerm(
      shingles: DataFrame, numHashes: Int): DataFrame = {
    val aggs = permConstants(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("__h") + lit(b)) % P31).as(s"__m$i")
    }
    shingles.toDF("id", "sh")
      .withColumn("__h", md5Base(col("sh")))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(
        col("id"),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Distinct k-shingle ARRAY of a text column — the same value set
    * [[shingleSet]] explodes, kept per-row so consumers can compute
    * whole-document statistics (signatures, intersections) without a
    * Generate + re-group round trip. Compiled kernel
    * ([[graft.expressions.ShingleSet]]): one O(bytes) scan instead of
    * the composed form's interpreted per-position lambdas with O(n^2)
    * substring re-scans.
    */
  def shingleArray(textCol: String, k: Int): Column =
    graft.expressions.ShingleMinHash.shingleSet(col(textCol), k)

  /** MinHash signatures computed PER ROW — the same integer arithmetic
    * as [[minhashSignaturesPerm]] over [[shingleSet]] (one md5 per
    * distinct shingle, then min of (a_i*h + b_i) mod P31 per
    * permutation), but evaluated as ONE compiled projection over the doc
    * table ([[graft.expressions.MinHashSig]]): no Generate, no exchange,
    * nothing shuffled at all. The exploded path shuffles ~|shingles|
    * hashed rows per doc to regroup what was already grouped — per-row
    * evaluation keeps the signature derivation where the text is (guide
    * §2.4: remove shuffles outright). Null texts are dropped, exactly as
    * the explode drops them. Per-row transient state is O(doc length) —
    * the same order as the text itself.
    */
  def minhashSigsPerRow(
      df: DataFrame, idCol: String, textCol: String, k: Int,
      numHashes: Int): DataFrame =
    df
      .filter(col(textCol).isNotNull)
      .select(
        col(idCol).as("id"),
        graft.expressions.ShingleMinHash
          .minhashSig(col(textCol), k, permConstants(numHashes))
          .as("sig"))

  /** (id, sig, band, bucket) banding of a signature frame — the shared
    * blocking step of the self-join and cross-set LSH variants below.
    */
  private def banded(
      sigs: DataFrame, bands: Int, sqlBuckets: Boolean): DataFrame = {
    // bucket key per band: hash of the band's signature slice (fast
    // default), or the slice itself joined to a string — bit-identical to
    // DuckDB string_agg(m, ',' ORDER BY perm), for oracle checking
    val sliceExpr =
      s"slice(sig, band * (size(sig) div $bands) + 1, size(sig) div $bands)"
    val bucketCol =
      if (sqlBuckets)
        expr(s"array_join(transform($sliceExpr, x -> cast(x as string)), ',')")
      else xxhash64(col("band"), expr(sliceExpr)).cast("string")
    sigs
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("sig"), col("band"), bucketCol.as("bucket"))
  }

  /** Estimated similarity of two joined signature columns: fraction of
    * matching minhash positions.
    */
  private def estJaccard: Column =
    Q.r6(
      expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), z -> z))") *
        1.0 / expr("size(sig_a)"))

  /** LSH candidate pairs: split signatures into `bands` bands, bucket by
    * band hash, emit distinct id pairs sharing any bucket, with estimated
    * similarity = fraction of matching minhashes.
    */
  def lshCandidates(
      sigsIn: DataFrame, bands: Int,
      sqlBuckets: Boolean = false): DataFrame = {
    // The signature frame is consumed 3x (banding + two joins back); its
    // upstream — shingle explode + md5 + 32-perm min-agg — is the most
    // expensive stage of the pipeline, so materialize it once instead of
    // recomputing per reference. Signatures are tiny next to the text
    // (id + numHashes ints), so this holds at scale. localCheckpoint
    // (not persist): blocks are released when the checkpointed RDD is
    // GC'd, so long-lived sessions need no caller-side unpersist.
    val sigs = sigsIn.localCheckpoint()
    val bk = banded(sigs, bands, sqlBuckets)
    // dedupe bare id pairs first (cheap shuffle), then join signatures
    // back — never shuffle signature arrays through the pair distinct
    val a = bk.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = bk.select(col("band"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard.as("est_jaccard"))
  }

  /** Star-reduced LSH bucket edges — the SCALE-MODE input to connected
    * components: within one (band, bucket) every member pair is an LSH
    * candidate, but component connectivity only needs the bucket
    * SPANNED, so one hub star (min id -> each other member) replaces
    * the C(n,2) pair set. Edge volume is O(corpus x bands) instead of
    * O(duplicate-mass^2) — at the adversarial sf1 corpus that is ~200k
    * edges where the verified-pair chain materializes 36.7M. The
    * components over these edges equal the components over the FULL
    * unverified candidate-pair graph (star spans each bucket; the
    * transitive closure is identical) — what is dropped is the
    * per-pair est_jaccard >= t verification, which is exactly the
    * production trade ("bucket-connectivity dedup"): banding
    * parameters, not a post-filter, set the similarity bar.
    */
  def lshBucketStarEdges(
      sigs: DataFrame, bands: Int,
      sqlBuckets: Boolean = false): DataFrame = {
    val bk = banded(sigs, bands, sqlBuckets)
    bk.select(col("band"), col("bucket"), col("id"))
      .withColumn("id_a",
        min(col("id")).over(Window.partitionBy("band", "bucket")))
      .filter(col("id") =!= col("id_a"))
      .select(col("id_a"), col("id").as("id_b"))
      .distinct()
  }

  /** SCALE-MODE incremental ingest flags: ids from `newSigs` that share at
    * least one (band, bucket) with ANY member of `oldSigs` — the
    * bucket-connectivity twin of [[lshCandidatesAcross]]. The corpus side
    * collapses to its DISTINCT bucket set before the join and the new
    * side is a semi-join probe, so nothing is ever pair-materialized:
    * cost is O(corpus x bands) to build the bucket index (precomputable,
    * incrementally maintainable) + O(shard x bands) to probe it, where
    * the verified-pair form is quadratic in per-bucket duplicate mass
    * (the measured sf100 disk kill). What is given up is the per-pair
    * est_jaccard >= t verification: banding parameters set the
    * similarity bar, same trade as [[lshBucketStarEdges]].
    */
  def lshBucketHitIds(
      newSigs: DataFrame, oldSigs: DataFrame, bands: Int,
      sqlBuckets: Boolean = false): DataFrame = {
    val probe = banded(newSigs, bands, sqlBuckets)
      .select(col("band"), col("bucket"), col("id"))
    val index = banded(oldSigs, bands, sqlBuckets)
      .select(col("band"), col("bucket")).distinct()
    probe.join(index, Seq("band", "bucket"), "left_semi")
      .select("id").distinct()
  }

  /** Cross-set LSH: candidate (id_a from `newSigs`, id_b from `oldSigs`)
    * pairs sharing any band bucket — the INCREMENTAL ingest shape, where
    * a new shard is deduped against the existing corpus instead of
    * against itself. Same banding, pair-dedup-before-signature-join, and
    * estimate as `lshCandidates`; at scale the old side's banded buckets
    * are a precomputed index the daily shard joins against.
    * Both signature frames are materialized once via localCheckpoint
    * (consumed twice each) — blocks free with RDD GC, no caller contract.
    */
  def lshCandidatesAcross(
      newSigs: DataFrame, oldSigs: DataFrame, bands: Int,
      sqlBuckets: Boolean = false): DataFrame = {
    val ns = newSigs.localCheckpoint()
    val os = oldSigs.localCheckpoint()
    val a = banded(ns, bands, sqlBuckets)
      .select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = banded(os, bands, sqlBuckets)
      .select(col("band"), col("bucket"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(ns.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(os.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard.as("est_jaccard"))
  }

  /** Connected components over an undirected edge list `(id_a, id_b)` by
    * iterative min-label propagation: every vertex's label converges to
    * the smallest vertex id in its component — the canonical "keep this
    * doc, drop the rest" cluster id that turns near-dup PAIRS into dedup
    * DECISIONS.
    *
    * Each iteration is one equi-join + one min-aggregation on vertex id
    * (plain shuffles AQE can size), and lineage is truncated with an
    * eager localCheckpoint so plan depth stays O(1) across iterations.
    * Converges in O(component diameter) passes — near-dup graphs are
    * shallow (LSH clusters are quasi-cliques), so this beats the
    * constant-factor-heavier large-star/small-star on the graphs this
    * engine feeds it; the join+min primitives are the same if a
    * deep-graph variant is ever needed.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    // Materialize the (possibly expensive) upstream edge pipeline ONCE —
    // an eager localCheckpoint truncates lineage so every iteration reads
    // stored blocks instead of re-deriving (or first-action-priming) it.
    val sym = edges
      .select(col("id_a").cast("long").as("src"),
        col("id_b").cast("long").as("dst"))
      .unionByName(edges.select(
        col("id_b").cast("long").as("src"),
        col("id_a").cast("long").as("dst")))
      .distinct().localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min("comp").as("nbr"))
      // NOTE: Dataset.observe would fold this count into the checkpoint
      // job, but initializing the session's ObservationManager (a lazy,
      // non-serializable field) poisons later task closures that capture
      // the session via MLlib trainingSummary objects — so the
      // convergence count is a second, cheap agg over the CHECKPOINTED
      // labels (vertex-count rows, no joins) instead.
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"),
          (coalesce(col("nbr"), col("comp")) < col("comp"))
            .cast("long").as("__chg"))
        .localCheckpoint() // eager: materialized before the old gen is freed
      // Convergence agg only every 2nd iteration (and at the cap): LSH
      // near-dup graphs are quasi-cliques that converge in 2-3 passes, so
      // checking every pass spends an extra action per iteration for a
      // signal that rarely fires early; the worst case is ONE redundant
      // (idempotent) propagation pass after the fixpoint.
      changed =
        if (i % 2 == 1)
          next.agg(coalesce(sum("__chg"), lit(0L))).head().getLong(0)
        else 1L
      labels.unpersist() // superseded checkpoint blocks — don't pin memory
      labels = next.drop("__chg")
      i += 1
    }
    sym.unpersist()
    labels
  }

  /** STREAMING exact dedup: the same keep-first-arrival semantics as
    * `exactDupGroups`, but over a Structured Streaming read —
    * `dropDuplicates` keeps per-key state (one md5 fingerprint per
    * distinct doc) across micro-batches, so late duplicates are dropped
    * exactly once no matter which batch they arrive in. The survivors
    * drain to a memory sink and are summarized per language batch-side;
    * the oracle is the batch COUNT(DISTINCT text) per lang.
    */
  def streamingDistinctCounts(
      spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_dedup"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docs = graft.sources.StreamRead.table(spark, sfDir, "documents", schema)
    val sq = docs
      .select(col("lang"), md5(col("text").cast("binary")).as("fp"))
      .dropDuplicates("lang", "fp")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { sq.processAllAvailable(); graft.streaming.StreamMetrics.dump(sq) } finally sq.stop()
    spark.table(name)
      .groupBy("lang").agg(count(lit(1)).as("n_distinct"))
      .orderBy("lang")
  }

  /** Watermark-bounded streaming exact dedup over the event stream —
    * the production form of [[streamingDistinctCounts]]: per-key state
    * is EVICTED once the event-time watermark passes, so state stays
    * proportional to the dedup window instead of the whole history.
    * Duplicates arriving inside the delay dedupe exactly; the harness
    * file source drains in order, so the drained table equals the batch
    * per-type distinct-user count (the gate's oracle).
    */
  def streamingDistinctUsersWithinWatermark(
      spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_dedup_wm"
    val sq = graft.streaming.EventOps.streamingEvents(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("ts_event"))
      .withWatermark("ts_event", "1 hour")
      .dropDuplicatesWithinWatermark("event_type", "user_id")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try { sq.processAllAvailable(); graft.streaming.StreamMetrics.dump(sq) } finally sq.stop()
    spark.table(name)
      .groupBy("event_type").agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
  }

  /** SimHash over whitespace tokens weighted by in-doc frequency.
    * One explode + one wide aggregation; fingerprint assembled bitwise.
    * Default: 63 bits of xxhash64. With (`md5Hash60`, nBits = 60) the
    * fingerprints are DuckDB-oracle-checkable.
    */
  def simhash(
      df: DataFrame, idCol: String, textCol: String, nBits: Int = 63,
      hashFn: (Column, Int) => Column = xxHash): DataFrame = {
    val toks = df.select(
        col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("w"))
      .withColumn("h", hashFn(col("tok"), 0))
    val bitSums = (0 until nBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, col("w"))
        .otherwise(-col("w"))).as(s"s$i")
    }
    val fp = (0 until nBits)
      .map(i => when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fp.as("simhash"))
  }

  /** All pairs within `maxDist` Hamming distance of each other's SimHash,
    * found EXACTLY without an all-pairs compare: split each fingerprint
    * into `nBands` contiguous `bandBits`-bit bands and equi-join on
    * (band, bucket). Pigeonhole: two fingerprints differing in at most
    * nBands-1 bits must agree on at least one full band, so with
    * maxDist < nBands the banded candidate set provably contains every
    * qualifying pair — banding here is a lossless pruning, unlike
    * MinHash-LSH's probabilistic recall. Candidates are verified with
    * one bit_count(xor) projection. Shuffle carries (id, fingerprint,
    * bucket) only.
    */
  def simhashHammingPairs(
      sh: DataFrame, nBands: Int, bandBits: Int, maxDist: Int): DataFrame = {
    require(maxDist < nBands,
      s"pigeonhole guarantee needs maxDist < nBands (got $maxDist >= $nBands)")
    val mask = (1L << bandBits) - 1
    val banded = sh.select(
        col("id"), col("simhash"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))
              .as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("id").as("ia"), col("simhash").as("sa"),
      col("band"), col("bucket"))
    val b = banded.select(col("id").as("ib"), col("simhash").as("sb"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("ia") < col("ib"))
      .select(col("ia").as("id_a"), col("ib").as("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
