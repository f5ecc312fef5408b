package graft.sketch

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val k = 3
  private val m = 256

  private lazy val protected_ = (1 to 100).map(i => s"member$i").toDF("g")
  private lazy val filter = BloomFilter.build(protected_, "g", k, m)

  test("filter size is bounded by min(k*n, m)") {
    assert(filter.count() <= math.min(k * 100, m).toLong)
  }

  test("zero false negatives: every member passes the probe") {
    val hits = BloomFilter.probe(protected_, "g", filter, k, m)
    assert(hits.count() == 100L)
  }

  test("false positives exist but are a bounded minority") {
    // 100 members x 3 hashes into 256 buckets -> fill ~ 1-e^(-300/256)
    // ~ 0.69, fp ~ 0.69^3 ~ 1/3; probe 500 non-members and check the
    // measured rate is non-trivial yet well under half (the point of a
    // PREfilter: cheap, one-sided, not exact)
    val nonMembers = (1 to 500).map(i => s"other$i").toDF("g")
    val fp = BloomFilter.probe(nonMembers, "g", filter, k, m).count()
    assert(fp > 0L, "with these parameters some false positives are expected")
    assert(fp < 250L, s"fp rate ${fp / 500.0} too high — hashing broken?")
  }
}
