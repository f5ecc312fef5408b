package graft.joins

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BloomJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val urgent = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")

  test("bloom semi join is row-identical to the plain semi join") {
    val plain = li.join(
        urgent.select(col("o_orderkey").as("k")),
        col("l_orderkey") === col("k"), "left_semi")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloomed = BloomJoin
      .bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bloomed === plain)
    assert(plain.nonEmpty)
  }

  test("no false negatives: every build key probes true") {
    val keys = (1L to 500L).map(_ * 7919).toDF("k")
    val bits = BloomJoin.buildBits(keys, "k", k = 3, m = 1 << 12)
    val misses = keys
      .filter(!BloomJoin.mightContain(col("k"), bits, k = 3, m = 1 << 12))
      .count()
    assert(misses === 0)
  }

  test("the prune actually drops most non-matching probes") {
    val build = (1L to 100L).toDF("k")
    val probe = (1L to 100000L).toDF("k")
    val bits = BloomJoin.buildBits(build, "k", k = 3, m = 1 << 16)
    val surviving = probe
      .filter(BloomJoin.mightContain(col("k"), bits, k = 3, m = 1 << 16))
      .count()
    // 100 true keys + fp rate well under 1% at 300 set bits / 65536
    assert(surviving >= 100 && surviving < 1100, s"surviving=$surviving")
  }

  test("bit test agrees between interpreted eval and codegen") {
    val bits = BloomJoin.buildBits((1L to 50L).toDF("k"), "k", 3, 1 << 10)
    val df = (1L to 2000L).toDF("k")
      .withColumn("hit", BloomJoin.mightContain(col("k"), bits, 3, 1 << 10))
    // force both paths: whole-stage codegen on, then off
    val on = df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      assert(on === off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
