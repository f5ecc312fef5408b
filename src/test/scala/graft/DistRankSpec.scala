package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.DistRank

/** DistRank must reproduce the single-task global window EXACTLY —
  * row numbers, running sums, and grand totals — across ascending /
  * descending orders, tie-heavy keys, and bucket counts that force the
  * multi-bucket offset path (the whole point of the helper).
  */
class DistRankSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private lazy val li = spark.read
    .parquet(s"$dir/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice"), Q.cents("l_quantity").as("qty_cents"))

  test("ascending rank + running sum + totals match the global window") {
    val order = Seq(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val got = DistRank.withRowNumber(li, col("l_extendedprice"), order,
        cums = Seq("qty_cents" -> "cum_qty"), totalCountCol = Some("n"),
        totalSumCols = Seq("qty_cents" -> "tot_qty"), buckets = 7)
      .select("l_orderkey", "l_linenumber", "rn", "cum_qty", "n", "tot_qty")
    val w = Window.orderBy(order: _*)
    val want = li.select(col("l_orderkey"), col("l_linenumber"),
      row_number().over(w).cast("long").as("rn"),
      sum("qty_cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("cum_qty"),
      count(lit(1)).over(Window.partitionBy()).as("n"),
      sum("qty_cents").over(Window.partitionBy()).as("tot_qty"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("descending rank matches (negated bucket key)") {
    val order = Seq(desc("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val got = DistRank.withRowNumber(li, negate(col("l_extendedprice")),
        order, buckets = 7)
      .select("l_orderkey", "l_linenumber", "rn")
    val want = li.select(col("l_orderkey"), col("l_linenumber"),
      row_number().over(Window.orderBy(order: _*)).cast("long").as("rn"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("tie-heavy key (few distinct values) keeps tie runs contiguous") {
    // qty_cents has ~50 distinct values over 6k rows: bucket edges fall
    // ON tie runs, the case where a partition-id-based split would break
    val order = Seq(col("qty_cents"), col("l_orderkey"), col("l_linenumber"))
    val got = DistRank.withRowNumber(li, col("qty_cents"), order,
        buckets = 7)
      .select("l_orderkey", "l_linenumber", "rn")
    val want = li.select(col("l_orderkey"), col("l_linenumber"),
      row_number().over(Window.orderBy(order: _*)).cast("long").as("rn"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("single-value key degenerates to one bucket and stays exact") {
    val one = li.limit(100).withColumn("k", lit(5L))
    val got = DistRank.withRowNumber(one, col("k"),
        Seq(col("k"), col("l_orderkey"), col("l_linenumber")), buckets = 7,
        totalCountCol = Some("n"))
    assert(got.agg(max("rn"), max("n")).head() ==
      org.apache.spark.sql.Row(100L, 100L))
  }

  test("session_window-derived frame ranks exactly (pushdown trap)") {
    // Regression: a predicate on the bucket column was pushed below the
    // session_window aggregate by Catalyst, where merged-session
    // end-start degenerates to 0 per event — the filter silently
    // vanished and the last bucket self-contributed to the offsets
    // (ranks 947..998 over a 946-row frame). DistRank must stay exact
    // over merge-style grouping keys.
    val gapUs = 30L * 60 * 1000000L
    val sess = graft.streaming.EventOps.events(spark, dir)
      .groupBy(col("user_id"),
        session_window(col("event_ts"), s"$gapUs microseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select((unix_micros(col("session_window.end")) -
        unix_micros(col("session_window.start")) - gapUs).as("dur_us"))
    val got = DistRank.withRowNumber(sess, col("dur_us"),
      Seq(col("dur_us")), totalCountCol = Some("n"), buckets = 7)
    val n = sess.count()
    val ranks = got.select("rn").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to n).toSeq,
      s"ranks must be exactly 1..$n")
    assert(got.select(max("n")).head().getLong(0) == n)
  }

  test("plan has no unpartitioned window and ranks in parallel buckets") {
    val got = DistRank.withRowNumber(li, col("l_extendedprice"),
      Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
      buckets = 7)
    val globals = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, "DistRank must not plan a global window")
  }

  test("null bucket key fails fast instead of corrupting ranks") {
    // CutBucket maps null/NaN to bucket -1, which would inflate every
    // offset while itself ranking from 0 — DistRank now raises in-plan
    // (fail-fast-not-wrong; the scaladoc contract, enforced).
    val withNull = li.withColumn("k",
      when(col("l_linenumber") === 1, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")))
    // consume rn: a bare count() lets Catalyst ELIMINATE the offset
    // join (its right side is unique on the aggregate key) and prune
    // __dr_b — so the guard, like the ranks, only evaluates on plans
    // that actually read the rank output
    val ex = intercept[Exception] {
      DistRank.withRowNumber(withNull, col("k"),
        Seq(col("k"), col("l_orderkey"), col("l_linenumber")), buckets = 5)
        .agg(sum("rn")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("non-null")),
      s"expected the DistRank raise_error, got: $ex")
  }

  private def raiseMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e =>
      Option(e.getMessage).toSeq ++ raiseMessages(e.getCause))

  test("null key raises even when only cum columns are consumed") {
    // Catalyst prunes unused aggregate outputs: a consumer that never
    // reads rn (so sum(__dr_c) — the originally-guarded column — is
    // pruned from the offset aggregate) must STILL hit the guard via
    // the cum-sum offsets, or bad keys would silently corrupt the
    // running sums (ADVICE r12). Pins the all-aggregates anchor.
    val withNull = li.withColumn("k",
      when(col("l_linenumber") === 1, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")))
    val ex = intercept[Exception] {
      DistRank.withRowNumber(withNull, col("k"),
        Seq(col("k"), col("l_orderkey"), col("l_linenumber")),
        cums = Seq("qty_cents" -> "cum_qty"), buckets = 5)
        .agg(sum("cum_qty")).collect()
    }
    assert(raiseMessages(ex).exists(_.contains("non-null")),
      s"expected the DistRank raise_error, got: $ex")
  }

  test("null key raises even when only grand totals are consumed") {
    // Same pruning hazard through the totals branch: sum(__dr_s_src)
    // never touches __dr_c, so only the per-aggregate guard keeps a
    // totals-only consumer fail-fast.
    val withNull = li.withColumn("k",
      when(col("l_linenumber") === 1, lit(null).cast("double"))
        .otherwise(col("l_extendedprice")))
    val ex = intercept[Exception] {
      DistRank.withRowNumber(withNull, col("k"),
        Seq(col("k"), col("l_orderkey"), col("l_linenumber")),
        totalSumCols = Seq("qty_cents" -> "tot_qty"), buckets = 5)
        .agg(max("tot_qty")).collect()
    }
    assert(raiseMessages(ex).exists(_.contains("non-null")),
      s"expected the DistRank raise_error, got: $ex")
  }
}
