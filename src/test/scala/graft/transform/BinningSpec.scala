package graft.transform

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for pandas-`cut` edge semantics (FIXTURES.md §6). */
class BinningSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("right-closed intervals with include_lowest and out-of-range -> -1") {
    val model = BinModel("x", Array(0.0, 2.0, 4.0))
    val df = Seq(
      Some(0.0), Some(1.0), Some(2.0), Some(2.1), Some(4.0), Some(4.5),
      Some(-0.5), None).toDF("x")
    val got = model.transform(df, "b").select("b").as[Int].collect().toSeq
    // pandas: [0,2] -> 0 (include_lowest), (2,4] -> 1, outside/NaN -> -1
    assert(got == Seq(0, 0, 0, 1, 1, -1, -1, -1))
  }

  test("duplicates='drop' collapses equal edges") {
    assert(Binning.dedupEdges(Array(1.0, 1.0, 2.0, 2.0, 2.0, 3.0)).toSeq ==
      Seq(1.0, 2.0, 3.0))
  }

  test("quantile binner forces end edges to min/max and buckets partition") {
    val df = Seq(1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 100.0).toDF("x")
    val m = QuantileBinner.fit(df, "x", 4)
    assert(m.edges.head == 1.0 && m.edges.last == 100.0)
    val codes = m.transform(df, "b").select("b").as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < m.nBins)) // every row in a bucket
  }

  test("equal-width binner: single-value column degenerates to one bucket") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val m = EqualWidthBinner.fit(df, "x", 4)
    assert(m.nBins == 1)
    assert(m.transform(df, "b").select("b").as[Int].collect().forall(_ == 0))
  }

  test("approx quantile binner tracks the exact one on smooth data") {
    val df = (1 to 10000).map(_.toDouble).toDF("x")
    val exact = QuantileBinner.fit(df, "x", 4)
    val approx = QuantileBinner.fitApprox(df, "x", 4, relativeError = 0.001)
    assert(approx.nBins == 4)
    exact.edges.zip(approx.edges).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 10000 * 0.002 + 1)
    }
  }

  test("equal-width bucket codes are dense in [0, n)") {
    val df = (0 to 80).map(_.toDouble).toDF("x")
    val m = EqualWidthBinner.fit(df, "x", 8)
    val codes =
      m.transform(df, "b").select("b").as[Int].collect().distinct.sorted
    assert(codes.toSeq == (0 until 8))
  }

  test("grid fit is edge-for-edge identical to Spark percentile") {
    // The distributed grid fit must reproduce `percentile`'s doubles
    // EXACTLY (not approximately): same rank position p*(n-1), same
    // (ceil(k)-k)*lo + (k-floor(k))*hi interpolation, same
    // short-circuits. Pin on real table columns (ties, skew, nulls-free
    // money grids) and an odd bin count whose probs are non-dyadic.
    import org.apache.spark.sql.functions.expr
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    for ((c, k) <- Seq(("l_extendedprice", 8), ("l_quantity", 4),
        ("l_discount", 6), ("l_tax", 3), ("l_extendedprice", 7))) {
      val probs = (0 to k).map(i => i.toDouble / k)
      val viaAgg = li
        .agg(expr(s"percentile($c, array(${probs.mkString(",")}))"))
        .head().getSeq[Double](0).toArray
      val got = QuantileBinner.fit(li, c, k)
      val want = BinModel(c,
        Binning.atLeastOneBucket(Binning.dedupEdges(viaAgg)))
      assert(got.edges.toSeq == want.edges.toSeq,
        s"$c k=$k: ${got.edges.toSeq} != ${want.edges.toSeq}")
    }
    // null handling: percentile ignores nulls; so must the grid
    val withNulls = Seq(Some(1.0), None, Some(2.0), Some(3.0), None)
      .toDF("x")
    val m = QuantileBinner.fit(withNulls, "x", 2)
    assert(m.edges.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("grouped grid quantiles equal per-group Spark percentile exactly") {
    import org.apache.spark.sql.functions.{array, col, expr, lit, posexplode}
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val kv = li.select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"))
    val probs = kv.select("g").distinct()
      .select(col("g"),
        posexplode(array(lit(0.25), lit(0.5), lit(0.75))).as(Seq("i", "p")))
    val got = GridQuantiles.quantiles(kv, probs)
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Int]("i")) ->
        r.getAs[Double]("q")).toMap
    val want = li.groupBy(col("l_returnflag").as("g"))
      .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE)," +
        " array(0.25, 0.5, 0.75))").as("qs"))
      .collect()
      .flatMap { r =>
        r.getSeq[Double](1).zipWithIndex.map { case (q, i) =>
          (r.getString(0), i) -> q
        }
      }.toMap
    assert(got == want)
  }
}
