package graft.sketch

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based Bloom membership prefilter (Bloom, "Space/time trade-offs
  * in hash coding with allowable errors", CACM 1970): the protected set
  * is compressed to its distinct bucket set B (k seeded md5-60 buckets
  * per element, so |B| <= min(k*n, m)); a probe element is a candidate
  * iff ALL k of its buckets are in B. One-sided error: zero false
  * negatives, false-positive rate ~= (1 - e^(-kn/m))^k.
  *
  * Scale shape: B is at most m rows no matter how large the protected
  * set, broadcasts to every probe partition, and the expensive exact
  * membership join runs only on bloom survivors — the standard two-phase
  * decontamination / blocklist pattern at 100 TB. (A serious
  * implementation packs B into m bits; the row form keeps the operator
  * a pure relational plan, which is also what makes it
  * oracle-replayable.)
  */
object BloomFilter {

  /** The k seeded buckets of an item (same md5-60 family as MinHash). */
  def buckets(item: Column, k: Int, m: Int): Seq[Column] =
    (0 until k).map(i => Dedup.md5Hash60(item, i) % m)

  /** Build: the distinct bucket set of the protected items. */
  def build(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame =
    items
      .select(explode(array(buckets(col(itemCol), k, m): _*)).as("bucket"))
      .distinct()

  /** Probe: the items whose k buckets ALL hit the filter. Each
    * (item, i, bucket) row matches the distinct-bucket filter at most
    * once, so hits == k means every hash row landed.
    */
  def probe(
      items: DataFrame, itemCol: String, filter: DataFrame, k: Int,
      m: Int): DataFrame =
    items
      .select(col(itemCol).as("item"),
        posexplode(array(buckets(col(itemCol), k, m): _*))
          .as(Seq("i", "bucket")))
      .join(broadcast(filter), Seq("bucket"))
      .groupBy("item").agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === k)
      .select(col("item"))
}
