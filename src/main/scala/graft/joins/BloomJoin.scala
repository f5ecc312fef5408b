package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContain

/** Bloom-pruned semi join — the runtime-filter pattern for big-big
  * joins: compress the (already filtered) build side's key set into an
  * m-bit Bloom filter, drop probe rows that cannot match inside the
  * probe scan via the codegen'd `BloomMightContain` bit test, and only
  * then run the exact semi join on the survivors. False positives are
  * removed by the exact join, false negatives cannot occur, so the
  * result is row-identical to the plain semi join while the shuffle
  * carries only ~selectivity x probe rows.
  *
  * The filter build collects at most m distinct bit positions to the
  * driver (m/8 bytes of filter, independent of build-side row count) —
  * the same bounded footprint Spark's own runtime row-level filtering
  * accepts. Hashing is xxhash64 (engine-internal; the operator's OUTPUT
  * is hash-independent, which is what the oracle checks).
  */
object BloomJoin {

  /** k seeded bucket positions in [0, m). */
  private def positions(key: Column, k: Int, m: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(m.toLong)))

  /** Driver-side word-packed filter over the build side's keys. */
  def buildBits(build: DataFrame, keyCol: String, k: Int, m: Int): Array[Long] = {
    require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
    val bits = new Array[Long](m / 64)
    build
      .select(explode(array(positions(col(keyCol), k, m): _*)).as("p"))
      .distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        bits((p >> 6).toInt) |= 1L << (p & 63)
      }
    bits
  }

  /** Probe predicate: all k bits set. Stays inside whole-stage codegen. */
  def mightContain(key: Column, bits: Array[Long], k: Int, m: Int): Column =
    positions(key, k, m)
      .map(BloomMightContain.column(_, bits))
      .reduce(_ && _)

  /** `probe SEMI JOIN build` with the Bloom prune in front. */
  def bloomSemiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      k: Int = 3, m: Int = 1 << 16): DataFrame = {
    val bits = buildBits(build, buildKey, k, m)
    probe
      .filter(mightContain(col(probeKey), bits, k, m))
      .join(build.select(col(buildKey).as("__bloom_bk")).distinct(),
        col(probeKey) === col("__bloom_bk"), "left_semi")
  }
}
