package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DriftSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("identical distributions drift zero") {
    val a = Seq("x", "x", "y", "z").toDF("c")
    val r = Drift.columnDrift(a, a, "c").collect()(0)
    assert(r.getAs[Long]("tv_micro") === 0L)
    assert(r.getAs[Double]("tv") === 0.0)
  }

  test("disjoint supports drift to 1.0 exactly") {
    val a = Seq("x", "x").toDF("c")
    val b = Seq("y", "z").toDF("c")
    val r = Drift.columnDrift(a, b, "c").collect()(0)
    // |1e6-0| + |0-5e5| + |0-5e5| = 2e6 -> tv = 1.0
    assert(r.getAs[Long]("tv_micro") === 2000000L)
    assert(r.getAs[Double]("tv") === 1.0)
    assert(r.getAs[Long]("values_old") === 1L)
    assert(r.getAs[Long]("values_new") === 2L)
  }

  test("half-moved mass drifts 0.5; nulls are a value") {
    val a = Seq[Option[String]](Some("x"), Some("x")).toDF("c")
    val b = Seq[Option[String]](Some("x"), None).toDF("c")
    val r = Drift.columnDrift(a, b, "c").collect()(0)
    // shares: x 1e6 -> 5e5 (d=5e5), null 0 -> 5e5 (d=5e5) -> tv 0.5
    assert(r.getAs[Long]("tv_micro") === 1000000L)
    assert(r.getAs[Double]("tv") === 0.5)
  }

  test("an empty shard yields full drift, not an ANSI divide error") {
    val a = Seq("x", "y").toDF("c")
    val b = a.filter(col("c") === "nope")
    val r = Drift.columnDrift(a, b, "c").collect()(0)
    assert(r.getAs[Long]("n_new") === 0L)
    // the empty side carries zero mass for every value, so the absolute
    // differences sum to the old side's whole 1e6 share mass (tv 0.5 —
    // TV against a zero measure, not against another distribution)
    assert(r.getAs[Long]("tv_micro") === 1000000L)
    assert(r.getAs[Double]("tv") === 0.5)
  }

  test("report emits one row per column with numeric columns as strings") {
    val a = Seq((1L, "p"), (2L, "q")).toDF("n", "s")
    val b = Seq((1L, "p"), (1L, "q")).toDF("n", "s")
    val rows = Drift.report(a, b, Seq("n", "s")).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("n", "s"))
    val byCol = rows.map(r => r.getString(0) -> r.getAs[Long]("tv_micro")).toMap
    assert(byCol("s") === 0L)
    assert(byCol("n") === 1000000L) // n: {1:1e6? no: 1:5e5,2:5e5} vs {1:1e6}
  }
}
