package graft.transform

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MergeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")

  private def merged(changes: Seq[(Long, String, Double, String)]) =
    Merge.applyChanges(
        snap, changes.toDF("id", "name", "bal", "op"), "id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .sortBy(_._1)

  test("update replaces, delete removes, insert adds, rest kept") {
    val out = merged(Seq(
      (2L, "B", 25.0, "U"), (3L, "c", 30.0, "D"), (9L, "z", 1.0, "I")))
    assert(out === Seq(
      (1L, "a", 10.0, "kept"),
      (2L, "B", 25.0, "updated"),
      (9L, "z", 1.0, "inserted")))
  }

  test("matched-state drives semantics: unmatched D is a no-op, " +
      "matched I updates, unmatched U inserts") {
    val out = merged(Seq(
      (7L, "x", 0.0, "D"), (1L, "A", 11.0, "I"), (8L, "y", 2.0, "U")))
    assert(out === Seq(
      (1L, "A", 11.0, "updated"),
      (2L, "b", 20.0, "kept"),
      (3L, "c", 30.0, "kept"),
      (8L, "y", 2.0, "inserted")))
  }

  test("empty change batch passes the snapshot through as kept") {
    val out = merged(Seq.empty)
    assert(out.map(_._4).forall(_ == "kept") && out.size === 3)
  }

  test("changes missing a snapshot column are rejected") {
    intercept[IllegalArgumentException] {
      Merge.applyChanges(snap, Seq((1L, "a", "U")).toDF("id", "name", "op"),
        "id")
    }
  }
}
