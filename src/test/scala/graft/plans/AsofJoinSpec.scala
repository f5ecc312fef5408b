package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsofJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("picks the last right row at-or-before each left time; null when none") {
    val l = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 8L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (2L, 9L, "d"))
      .toDF("k2", "t2", "v")
    val out = AsofJoin.asof(l, r, "k", "k2", "t", "t2")
      .select(col("tag"), col("v"), col("t2"))
      .collect().map(x => (x.getString(0), x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    // e1@10: last right <= 10 is b@10 (tie at equal time matches)
    // e2@20: c@15; e3@5: none for key 2
    assert(out === Set(("e1", "b", 10L), ("e2", "c", 15L), ("e3", null, -1L)))
  }

  test("matches the window-composition as-of on the harness events") {
    val ev = graft.streaming.EventOps.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts_us")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("click_us"))
    val custom = AsofJoin
      .asof(errors, clicks, "user_id", "c_user", "ts_us", "click_us")
      .select(col("event_id"), col("click_us"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // reference: per-error max click time <= error time
    val expected = errors.as("e")
      .join(clicks, col("user_id") === col("c_user") &&
        col("click_us") <= col("ts_us"), "left")
      .groupBy("event_id").agg(max("click_us").as("m"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(custom === expected)
    assert(custom.nonEmpty && custom.values.exists(_.isDefined))
  }

  test("left-only filters push below the as-of node; right-side stay put") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L, "x")).toDF("k2", "t2", "v")
    val filtered = AsofJoin.asof(l, r, "k", "k2", "t", "t2")
      .filter(col("k") > 1L && col("v") === "x")
    val opt = filtered.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case a: AsofJoinPlan => a }.get
    // the k > 1 conjunct moved below the join (into/through its left)
    assert(aj.left.collectFirst { case f: LFilter => f }.isDefined ||
      aj.left.toString.contains("PushedFilters"),
      s"left side of:\n$opt")
    // the right-side conjunct stayed above (semantics would change below)
    assert(opt.collectFirst { case f: LFilter
        if f.child.isInstanceOf[AsofJoinPlan] => f }.isDefined,
      s"expected a residual filter above the as-of node:\n$opt")
    // and the result is still correct
    assert(filtered.count() === 0) // k=2 has no right match -> v is null
  }

  test("null keys and null times never match (SQL equi-join semantics)") {
    val l = Seq((Option(1L), Option(10L), "a"),  // normal match
                (None: Option[Long], Option(10L), "nullkey"),
                (Option(1L), None: Option[Long], "nulltime"))
      .toDF("k", "t", "tag")
    val r = Seq((Option(1L), Option(5L), "m1"),
                (None: Option[Long], Option(5L), "rnullkey"),
                (Option(1L), None: Option[Long], "rnulltime"))
      .toDF("k2", "t2", "v")
    val out = AsofJoin.asof(l, r, "k", "k2", "t", "t2")
      .select("tag", "v").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    // only the fully non-null pair matches; null-keyed/timed left rows
    // emit the null-right row, null-keyed/timed right rows match nothing
    assert(out === Map("a" -> "m1", "nullkey" -> null, "nulltime" -> null))
  }

  test("non-Long time columns are rejected at construction") {
    val l = Seq((1L, 10, "a")).toDF("k", "t", "tag") // t is IntegerType
    val r = Seq((1L, 5L, "x")).toDF("k2", "t2", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "k2", "t", "t2")
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("nondeterministic left-only predicates are NOT pushed below the join") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L, "x")).toDF("k2", "t2", "v")
    val filtered = AsofJoin.asof(l, r, "k", "k2", "t", "t2")
      .filter(rand(42) < 2.0 && col("k") > 0L)
    val opt = filtered.queryExecution.optimizedPlan
    val aj = opt.collectFirst { case a: AsofJoinPlan => a }.get
    // the rand() conjunct must stay above; the deterministic k > 0 may move
    assert(!aj.left.expressions.map(_.toString).exists(_.contains("rand")),
      s"nondeterministic predicate pushed below the as-of node:\n$opt")
    assert(filtered.count() === 2)
  }

  test("deterministic across partitionings; plan contains the custom exec") {
    val l = (1L to 500L).map(i => (i % 7, i)).toDF("k", "t")
    val r = (1L to 300L).map(i => (i % 7, i * 2 % 400)).toDF("k2", "t2")
    def run(lp: Int, rp: Int) = AsofJoin
      .asof(l.repartition(lp), r.repartition(rp), "k", "k2", "t", "t2")
      .select("k", "t", "t2")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(run(2, 5) === run(13, 1))
    val plan = AsofJoin.asof(l, r, "k", "k2", "t", "t2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(500))
  }
}
