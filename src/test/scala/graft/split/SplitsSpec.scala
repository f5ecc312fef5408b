package graft.split

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("hashFold partitions all rows into k folds deterministically") {
    val df = (1L to 100L).toDF("id")
    val folds = Splits.hashFold(df, "id", 5).groupBy("fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(folds == Map(0 -> 20L, 1 -> 20L, 2 -> 20L, 3 -> 20L, 4 -> 20L))
  }

  test("hashSample: deterministic, seed-sensitive, near the target rate") {
    val df = (1L to 1000L).toDF("id")
    val kept = Splits.hashSample(df, col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    // md5 is uniform: 50% +/- a generous tolerance
    assert(kept.size > 400 && kept.size < 600)
    val again = Splits.hashSample(df, col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(kept == again)
    val other = Splits.hashSample(df, col("id"), 50, seed = 7)
      .collect().map(_.getLong(0)).toSet
    assert(kept != other)
    assert(Splits.hashSample(df, col("id"), 0).count() == 0)
    assert(Splits.hashSample(df, col("id"), 100).count() == 1000)
  }

  test("weightedHashSample: w=0 drops all, w=1 keeps all, rate tracks weight") {
    val df = (1L to 2000L).toDF("id")
    assert(Splits.weightedHashSample(df, col("id"), lit(0.0)).count() == 0)
    assert(Splits.weightedHashSample(df, col("id"), lit(1.0)).count() == 2000)
    val k30 = Splits.weightedHashSample(df, col("id"), lit(0.3))
      .collect().map(_.getLong(0)).toSet
    assert(k30.size > 500 && k30.size < 700) // ~0.3 * 2000, generous band
    // deterministic: same seed reproduces the exact set
    val again = Splits.weightedHashSample(df, col("id"), lit(0.3))
      .collect().map(_.getLong(0)).toSet
    assert(k30 == again)
    // monotone in the weight: raising every weight only ADDS rows (the
    // uniform is per-row fixed, so a doc kept at w stays kept at w' > w)
    val k60 = Splits.weightedHashSample(df, col("id"), lit(0.6))
      .collect().map(_.getLong(0)).toSet
    assert(k30.subsetOf(k60))
    // per-row weights: rows with w=1 always survive alongside w=0 drops
    val mixed = df.withColumn("w", when(col("id") <= 1000L, 1.0).otherwise(0.0))
    val keptMixed = Splits.weightedHashSample(mixed, col("id"), col("w"))
      .collect().map(_.getLong(0)).toSet
    assert(keptMixed == (1L to 1000L).toSet)
  }

  test("stratified split: exact per-class proportions, disjoint, reproducible") {
    val df = ((1 to 80).map(i => (i, "a")) ++ (1 to 20).map(i => (i + 100, "b")))
      .toDF("id", "label")
    val s1 = Splits.stratifiedSplit(df, "label", 0.75, 42)
    val counts = s1.groupBy("label", "split").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(counts == Map(
      ("a", 0) -> 60L, ("a", 1) -> 20L, ("b", 0) -> 15L, ("b", 1) -> 5L))
    val s2 = Splits.stratifiedSplit(df, "label", 0.75, 42)
    assert(s1.filter(col("split") === 0).select("id").collect().map(_.getInt(0)).sorted
      sameElements
      s2.filter(col("split") === 0).select("id").collect().map(_.getInt(0)).sorted)
  }

  test("salted split matches the windowed spec-oracle per-class counts") {
    val df = ((1 to 321).map(i => (i, "a")) ++ (1 to 77).map(i => (i + 1000, "b")) ++
      Seq((5000, "c"))).toDF("id", "label")
    def counts(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("label", "split").count()
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (frac <- Seq(0.5, 0.8, 1.0)) {
      val salted = counts(Splits.stratifiedSplit(df, "label", frac, 42, saltBuckets = 7))
      val windowed = counts(Splits.stratifiedSplitWindowed(df, "label", frac, 42))
      assert(salted == windowed, s"frac=$frac")
    }
    // the registered plan's data-row window is salted (bounded task size)
    val plan = Splits.stratifiedSplit(df, "label", 0.8, 42)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), "expected salted window partitioning")
  }
}
