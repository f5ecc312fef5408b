package graft.sim

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to query
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite
    (4L, Array(1.0f, 1.0f, 0.0f))    // 45 degrees
  ).toDF("vec_id", "embedding")

  test("cosine top-k ranks identical > 45deg > orthogonal > opposite") {
    val got = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(got(0)._2 == 1.0)
    assert(math.abs(got(1)._2 - math.sqrt(0.5)) < 1e-5)
    assert(got(2)._2 == 0.0 && got(3)._2 == -1.0)
  }

  test("IVF index: full-probe recall equals brute force; partial probe subsets") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 3L, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = Similarity.ivfFit(emb, "vec_id", "embedding", nLists = 4)
    val full = Similarity.ivfTopK(idx, 3L, 10, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact) // probing all lists == brute force
    val partial = Similarity.ivfTopK(idx, 3L, 10, nProbe = 1)
      .collect().map(_.getLong(0)).toSet
    assert(partial.nonEmpty && partial.subsetOf(
      // every partial result is a true vector id with positive similarity rank
      emb.select("vec_id").collect().map(_.getLong(0)).toSet))
  }

  test("LSH near-dup pairs ⊆ brute force with identical exact cosines") {
    val emb2 = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.nearDupPairs(emb2, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (lshDf <- Seq(
        Similarity.nearDupPairsSignLsh(emb2, "vec_id", "embedding", 0.4),
        Similarity.nearDupPairsLsh(emb2, "vec_id", "embedding", 0.4))) {
      val lsh = lshDf.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      assert(lsh.nonEmpty)
      assert(lsh.map(_._1).distinct.length == lsh.length) // band dedup held
      lsh.foreach { case (k, c) => assert(brute(k) == c) } // exact rerank
    }
  }

  test("semantic dedup keeps exactly the ids with no lower-id near-dup") {
    val emb2 = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Similarity
      .nearDupPairsSignLsh(emb2, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedDropped = pairs.map(_._2).toSet
    val all = emb2.select("vec_id").collect().map(_.getLong(0)).toSet
    val kept = Similarity
      .semanticDedupKeep(emb2, "vec_id", "embedding", 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === all -- expectedDropped)
    assert(expectedDropped.nonEmpty) // the corpus has planted near-dups
  }

  test("kmeans SemDeDup: drops ⊆ brute-force near-dups; within-cluster sound") {
    val emb2 = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = Similarity.ivfFitLloyd(emb2, "vec_id", "embedding",
      nLists = 8, iters = 3)
    val all = emb2.select("vec_id").collect().map(_.getLong(0)).toSet
    val kept = Similarity.semanticDedupKMeans(idx, 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = all -- kept
    assert(dropped.nonEmpty) // the corpus has planted near-dups
    // within-cluster pairs are a subset of all pairs, so every drop must
    // have a LOWER-id brute-force near-dup (blocking can only lose
    // recall, never invent a duplicate)
    val bruteDrops = Similarity
      .nearDupPairs(emb2, "vec_id", "embedding", 0.4)
      .select("id_b").collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(bruteDrops))
    // and every drop shares its cluster with a lower-id near-dup
    val lists = idx.assigned.select("vec_id", "list")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pairs = Similarity
      .nearDupPairs(emb2, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (d <- dropped)
      assert(pairs.exists { case (a, b) => b == d && lists(a) == lists(d) })
  }

  test("sign-bucket ANN: results share the query bucket; cosines are exact") {
    import org.apache.spark.sql.functions.col
    val emb2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb2.count().toInt
    val exact = Similarity.cosineTopK(emb2, "vec_id", "embedding", 0L, n)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Similarity.annTopKSign(emb2, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, c) => assert(exact(id) == c) } // rerank is exact
    val bucketed =
      emb2.withColumn("__b", Similarity.signBucket(col("embedding"), 4))
    val qb = bucketed.filter(col("vec_id") === 0L).select("__b")
      .head().getLong(0)
    val inBucket = bucketed.filter(col("__b") === qb).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    got.foreach { case (id, _) => assert(inBucket.contains(id)) }
  }

  test("ANN bucket search finds the identical vector") {
    val got = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 2,
      nPlanes = 4, dim = 3)
      .collect().map(_.getLong(0))
    assert(got.contains(1L)) // identical vector always shares the bucket
  }

  test("nearest-centroid assignment recovers well-separated clusters") {
    // two tight clusters around (1,0,0) and (0,10,0)
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.1f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 10.0f, 0.0f), 1),
      (4L, Array(0.1f, 9.9f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val cent = Similarity.centroidsByLabel(labeled, "embedding", "label")
    val crows = cent.collect()
    assert(crows.length == 2)
    // centroid arrays are position-ordered r6 means
    val c0 = crows.find(_.getInt(0) == 0).get.getSeq[Double](1)
    assert(c0 == Seq(1.0, 0.033333, 0.0))
    val assigned = Similarity
      .assignToCentroids(labeled, "vec_id", "embedding", cent)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  test("MMR: diversity penalty demotes the near-duplicate of the first pick") {
    // 1 and 2 are both highly relevant but nearly identical; 3 is less
    // relevant but diverse. Pure relevance would pick (1, 2); MMR must
    // pick 1 then 3.
    // scores: step1 -> 1 (rel .9, id tiebreak over its twin 2);
    // step2: vec2 = .7*.9 - .3*1.0 = .33 (penalty 1.0 — identical to
    // pick 1), vec3 = .7*.8 - .3*.458 = .42 -> 3 wins despite lower rel
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),             // query
      (1L, Array(0.9f, 0.436f, 0.0f)),           // most relevant
      (2L, Array(0.9f, 0.436f, 0.0f)),           // exact dup of 1
      (3L, Array(0.8f, -0.6f, 0.0f))             // diverse, rel 0.8
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(vecs, "vec_id", "embedding", 0L, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L)
    assert(got(2L) == 3L) // NOT vec 2, despite higher raw relevance
  }

  test("centroid assignment ties break toward the smaller label") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f), 5), (1L, Array(-1.0f, 0.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val cent = Similarity.centroidsByLabel(labeled, "embedding", "label")
    // the midpoint is equidistant from both centroids -> label 3 wins
    val mid = Seq((9L, Array(0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.assignToCentroids(mid, "vec_id", "embedding", cent)
      .collect()
    assert(got.head.getInt(1) == 3)
  }

  test("recall@10 floors: PQ / sign / seeded-LSH vs exact truth") {
    // VERDICT r12 task 5: the registered recall-audit queries pin the
    // recall VALUE via oracle hash, but both sides replay the same
    // index — a parameter change that degrades recall would update the
    // oracle in lockstep and still hash-match. These floors anchor the
    // quality itself on the fixed sf0.001 corpus, with the SAME
    // parameters the registered queries use (pq m=4/subDim=16/kSub=8/
    // iters=2, sign nPlanes=4, lsh nPlanes=4 dim=64 seed=42).
    // Single-query recall is too noisy to gate (measured min over 20
    // queries is 0.0 for every family — a 4-plane bucket holds ~1/16
    // of a 500-vector corpus, so whole top-10s can miss the bucket),
    // so the floor is the MEAN over query ids 0..19. Measured r13:
    // pq=0.175, sign=0.16, lsh=0.105 (sf0.01 within 0.02 of each —
    // corpus-stable); floors at roughly measured-minus-40% absorb tie
    // reshuffles while still tripping on a real blocking/fit
    // regression (e.g. mis-seeded planes or a broken codebook push
    // these toward 0).
    val emb2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qids = (0L to 19L)
    var pq, sign, lsh = 0.0
    for (q <- qids) {
      val exact = Similarity.cosineTopK(emb2, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      def recallOf(df: org.apache.spark.sql.DataFrame): Double =
        df.collect().map(_.getLong(0)).toSet.intersect(exact).size / 10.0
      pq += recallOf(Similarity.pqTopKAdc(
        emb2, "vec_id", "embedding", q, 10,
        m = 4, subDim = 16, kSub = 8, iters = 2))
      sign += recallOf(Similarity.annTopKSign(
        emb2, "vec_id", "embedding", q, 10, nPlanes = 4))
      lsh += recallOf(Similarity.annTopK(
        emb2, "vec_id", "embedding", q, 10,
        nPlanes = 4, dim = 64, seed = 42))
    }
    val n = qids.size
    assert(pq / n >= 0.10, s"PQ/ADC mean recall@10 regressed: ${pq / n}")
    assert(sign / n >= 0.09, s"sign-bucket mean recall@10 regressed: ${sign / n}")
    assert(lsh / n >= 0.05, s"seeded-LSH mean recall@10 regressed: ${lsh / n}")
  }

  test("scaledPlaneCount: integer boundaries and clamps") {
    def p(n: Long) = Similarity.scaledPlaneCount(n, 32L, 4, 20)
    // smallest p with 32 * 2^p >= n, clamped to [4, 20]
    assert(p(0) == 4 && p(1) == 4 && p(32) == 4) // q <= 1 -> 0 -> clamp
    assert(p(512) == 4)     // 32 * 2^4 = 512, exactly covered at the min
    assert(p(513) == 5)     // one past the boundary needs the next bit
    assert(p(1024) == 5 && p(1025) == 6)
    assert(p(2000000) == 16)       // the sf100 corpus
    assert(p(Long.MaxValue / 2) == 20) // max clamp
    // contract: 32 * 2^p >= n whenever unclamped
    for (n <- Seq(33L, 100L, 5000L, 123457L, 2000000L)) {
      val k = p(n)
      assert(k == 20 || 32L * (1L << k) >= n, s"n=$n p=$k")
      assert(k == 4 || 32L * (1L << (k - 1)) < n, s"n=$n p=$k not minimal")
    }
  }

  test("scaledListCount: ceil-division boundaries and clamps") {
    def k(n: Long) = Similarity.scaledListCount(n, 1024L, 8, 1 << 20)
    // ceil(n/1024) clamped to [8, 2^20]
    assert(k(0) == 8 && k(1) == 8 && k(8192) == 8) // floor keeps small-sf
    assert(k(8193) == 9)     // first corpus that outgrows the floor
    assert(k(1024 * 100) == 100 && k(1024 * 100 + 1) == 101)
    assert(k(2000000) == 1954)        // the sf100 corpus
    assert(k(Long.MaxValue / 2) == (1 << 20)) // max clamp
    // contract: expected cluster size stays <= target whenever unclamped
    for (n <- Seq(9000L, 123457L, 2000000L)) {
      val kk = k(n)
      assert(kk.toLong * 1024L >= n, s"n=$n k=$kk undercovers")
      assert((kk.toLong - 1L) * 1024L < n, s"n=$n k=$kk not minimal")
    }
  }

  test("corpus-scaled near-dup: subset of exact pairs, pair-recall floor") {
    // The registered embedding_near_dup_scaled derives planes-per-band
    // from the corpus count (scaledPlaneCount), so its oracle would
    // follow a broken parameterization in lockstep — this floor anchors
    // the blocking quality itself against the O(n^2) exact truth on the
    // fixed sf0.001 corpus, with the registered query's parameters
    // (4 bands, pool seed 43, target bucket 32, threshold 0.4).
    val emb2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb2.count()
    val p = Similarity.scaledPlaneCount(n, 32L, 4, 20)
    assert(p >= 4 && p <= 20)
    val pool = Similarity.hyperplanes(4 * 20, dim = 64, seed = 43)
    val buckets = (0 until 4).map { b =>
      Similarity.lshBucket(
        org.apache.spark.sql.functions.col("embedding"),
        pool.slice(b * 20, b * 20 + p))
    }
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scaled = pairSet(Similarity.nearDupFromBands(
      emb2, "vec_id", "embedding", 0.4, buckets))
    val exact = pairSet(Similarity.nearDupPairs(
      emb2, "vec_id", "embedding", 0.4))
    // exact rerank inside buckets => every emitted pair is a true pair
    assert(scaled.subsetOf(exact))
    assert(exact.nonEmpty)
    val recall = scaled.size.toDouble / exact.size
    info(s"scaled near-dup pair recall at sf0.001: $recall " +
      s"(${scaled.size}/${exact.size}, p=$p)")
    assert(recall >= 0.30, s"scaled near-dup pair recall regressed: $recall")
  }

  test("PQ: codes cover every (id, sub); ADC ranks the exact duplicate first") {
    // 8 seed vectors (ids 0-7) in 4 dims, m=2 subspaces of 2 dims; vec 8
    // duplicates vec 0, vec 9 is far from everything.
    val base = Seq(
      0L -> Array(1f, 0f, 1f, 0f), 1L -> Array(0f, 1f, 0f, 1f),
      2L -> Array(1f, 1f, 0f, 0f), 3L -> Array(0f, 0f, 1f, 1f),
      4L -> Array(2f, 0f, 2f, 0f), 5L -> Array(0f, 2f, 0f, 2f),
      6L -> Array(2f, 2f, 0f, 0f), 7L -> Array(0f, 0f, 2f, 2f),
      8L -> Array(1f, 0f, 1f, 0f), 9L -> Array(9f, 9f, 9f, 9f))
    val vecs = base.map { case (i, v) => (i, v) }.toDF("vec_id", "embedding")
    val (codes, cents) = Similarity.pqFit(
      vecs, "vec_id", "embedding", m = 2, subDim = 2, kSub = 4, iters = 2)
    assert(codes.count() == 20) // 10 ids x 2 subspaces
    assert(codes.filter("code < 0 OR code >= 4").count() == 0)
    assert(cents.count() <= 8) // <= m * kSub surviving codebook rows
    val top = Similarity.pqTopKAdc(
      vecs, "vec_id", "embedding", 0L, 3, m = 2, subDim = 2, kSub = 4,
      iters = 2).collect()
    // vecs 4 and 8 land in the query's PQ cells (8 duplicates vec 0;
    // 4 = 2*vec0 clusters with it at kSub=4), so they tie at the minimal
    // ADC distance and the smaller id ranks first — ADC cannot separate
    // same-code vectors, by construction. Vec 9 must not make top-3.
    assert(top.map(_.getLong(0)).take(2).toSeq == Seq(4L, 8L))
    assert(top(0).getLong(1) == top(1).getLong(1))
    assert(!top.map(_.getLong(0)).contains(9L))
  }
}
