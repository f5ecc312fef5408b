package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def z(a: Long, b: Long, bits: Int = 8): Long =
    Seq((a, b)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), bits).as("z"))
      .head().getLong(0)

  test("zValue interleaves bits: a at even positions, b at odd") {
    // a=0b101 -> bits at 0,4 = 17; b=0b011 -> bits at 1,3 = 10.
    assert(z(5L, 3L) == 27L)
    assert(z(0L, 0L) == 0L)
    assert(z(255L, 0L, 8) == 0x5555L)
    assert(z(0L, 255L, 8) == 0xAAAAL)
  }

  test("zValue is a bijection on the small grid") {
    val grid = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val zs = grid.toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 256)
    assert(zs.min == 0L && zs.max == 255L)
  }

  test("z-ordered file ranges are narrow in both dimensions") {
    // 32x32 grid into 16 files of 64 rows: Z-order makes every file an
    // 8x8 tile, so each dimension's span is 7 — a single-key sort would
    // leave one dimension's span at the full 31.
    val grid = for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong)
    val spans = grid.toDF("a", "b")
      .select(col("a"), col("b"),
        Layout.zValue(col("a"), col("b"), 5).as("z"))
      .withColumn("f", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy("z")))
      .groupBy("f")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .select("sa", "sb").as[(Long, Long)].collect()
    assert(spans.forall { case (sa, sb) => sa <= 7 && sb <= 7 })
  }

  test("zValueSql matches the column expression") {
    val df = Seq((5L, 3L), (100L, 200L), (255L, 255L)).toDF("a", "b")
    val both = df.select(
      Layout.zValue(col("a"), col("b"), 8).as("zc"),
      expr(Layout.zValueSql("a", "b", 8)).as("zs"))
    assert(both.filter(col("zc") =!= col("zs")).isEmpty)
  }
}
