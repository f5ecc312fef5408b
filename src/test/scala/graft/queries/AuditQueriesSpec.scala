package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sketch/estimator audit queries (their value-level
  * parity is pinned by the DuckDB oracle; these pin the semantic
  * guarantees the oracle equality alone doesn't state).
  */
class AuditQueriesSpec extends AnyFunSuite with SparkTestSession {
  private val sf = "/root/testdata/sf0.001"

  test("minhash_estimate_error: calibration table is well-formed") {
    val rows = DocQueries.minhashCalibration.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val matches = r.getAs[Int]("matches")
      assert(matches >= 0 && matches <= 32)
      val n = r.getAs[Long]("n_pairs")
      val close = r.getAs[Long]("n_within_4_32")
      assert(n > 0 && close >= 0 && close <= n)
      val est = r.getAs[Double]("est_jaccard")
      assert(math.abs(est - matches / 32.0) < 1e-9)
      assert(r.getAs[Double]("min_exact") <= r.getAs[Double]("max_exact"))
    }
    // the corpus plants adjacent near-dups: some pairs agree on most
    // signature positions, and the estimator is within the +-4/32 band
    // for a majority of pairs overall
    assert(rows.map(_.getAs[Int]("matches")).max >= 16)
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val close = rows.map(_.getAs[Long]("n_within_4_32")).sum
    assert(close * 2 > total)
  }

  test("hist_quantile_merge_check: merged cells == global cells") {
    val rows = StatsQueries.histMergeCheck.run(spark, sf).collect()
    val byPart = rows.map(r => r.getAs[String]("part") -> r).toMap
    assert(byPart.keySet.contains("zz_merged") &&
      byPart.keySet.contains("zz_global"))
    // THE merge property: cell-wise merged per-shard grids are
    // bit-identical to the single-pass global grid
    assert(byPart("zz_merged").getAs[String]("grid_md5") ==
      byPart("zz_global").getAs[String]("grid_md5"))
    assert(byPart("zz_merged").getAs[Long]("n_cells") ==
      byPart("zz_global").getAs[Long]("n_cells"))
    // shard masses partition the global mass
    val shardMass = rows
      .filter(_.getAs[String]("part").startsWith("shard_"))
      .map(_.getAs[Long]("mass")).sum
    assert(shardMass == byPart("zz_global").getAs[Long]("mass"))
  }
}
