package graft

import graft.dedup.Dedup
import graft.stats.Stats
import graft.streaming.EventOps
import graft.transform.Scaling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior pinned for the operator surface: empty
  * tables and constant columns must yield empty/NULL results (or a
  * clear error), never an ANSI arithmetic crash deep in a job.
  */
class EdgeCasesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val emptyEvents = Seq.empty[(Long, Long, Long, String, Double)]
    .toDF("event_id", "ts_us", "user_id", "event_type", "value")

  test("all-pairs jaccard and term cosine: empty corpus -> empty result") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val sh = Dedup.shingleSet(emptyDocs, "doc_id", "text", 3)
    assert(Dedup.allPairsJaccard(sh, 0.8).count() == 0)
    val post = graft.text.TermCosine.postings(emptyDocs, "doc_id", "text")
    assert(graft.text.TermCosine.cosineTopK(post, 5, 10).count() == 0)
  }

  test("funnel: no stage-1 users -> NULL conversion, zero counts") {
    val r = EventOps.funnel(emptyEvents, Seq("a", "b", "c")).head()
    assert(r.getAs[Long]("n_stage1") == 0)
    assert(r.isNullAt(r.fieldIndex("conversion")))
    // present users but nobody signed up
    val noSignup = Seq((1L, 10L, 7L, "click", 1.0))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val r2 = EventOps.funnel(noSignup, Seq("signup", "click", "purchase")).head()
    assert(r2.getAs[Long]("n_stage1") == 0)
    assert(r2.isNullAt(r2.fieldIndex("conversion")))
  }

  test("rolling features and leakage matrix: empty input -> empty output") {
    assert(EventOps.rollingUserFeatures(emptyEvents).count() == 0)
    val e = Seq.empty[(String, String)].toDF("fp", "source")
    assert(Dedup.dupLeakageMatrix(e, col("fp"), "source").count() == 0)
  }

  test("mutualInfo on a constant column: zero entropy, NULL NMI") {
    val r = Stats.mutualInfo(Seq(("x", "y"), ("x", "y")).toDF("a", "b"),
      "a", "b").head()
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("h_a") == 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("Scaling.fit on an all-null/empty column raises a clear error") {
    val ex = intercept[IllegalArgumentException] {
      Scaling.fit(Seq.empty[Double].toDF("v"), "v")
    }
    assert(ex.getMessage.contains("no non-null rows"))
  }

  test("graph operators on empty edge frames return empty, not errors") {
    val e = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.graph.PageRank.pageRankMicro(e, "src", "dst", 3).count() == 0)
    assert(graft.graph.Triangles
      .perVertexTriangles(e, "src", "dst").count() == 0)
    assert(graft.graph.KCore
      .kCoreVertices(e, "src", "dst", 2, peels = 3).count() == 0)
  }

  test("bloom semi join with an empty build side prunes everything") {
    val probe = (1L to 100L).toDF("k")
    val build = Seq.empty[Long].toDF("bk")
    assert(graft.joins.BloomJoin
      .bloomSemiJoin(probe, "k", build, "bk").count() == 0)
  }

  test("SCD2 compaction and point-in-time on empty input are empty") {
    val obs = Seq.empty[(Long, String, Int)].toDF("k", "st", "seq")
    val hist = graft.transform.Scd.scd2Compact(obs, "k", "st", Seq("seq"))
    assert(hist.count() == 0)
    assert(graft.transform.Scd
      .pointInTime(hist, obs, "k", "seq", "seq", "st").count() == 0)
  }
}
