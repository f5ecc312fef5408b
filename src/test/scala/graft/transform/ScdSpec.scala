package graft.transform

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ScdSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val obs = Seq(
    // key, status, seq
    (1L, "O", 1), (1L, "O", 2), (1L, "F", 3), (1L, "O", 4),
    (2L, "F", 1),
    (3L, null.asInstanceOf[String], 1), (3L, null.asInstanceOf[String], 2),
    (3L, "P", 3)
  ).toDF("k", "st", "seq")

  private lazy val hist =
    Scd.scd2Compact(obs, "k", "st", Seq("seq"))
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("version"),
        r.getAs[String]("st"), r.getAs[Int]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getAs[Long]("n_rows"),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._2))

  test("consecutive equal values collapse; revisits open a new version") {
    val k1 = hist.filter(_._1 == 1L)
    assert(k1.map(t => (t._2, t._3, t._6)).toSeq ===
      Seq((1L, "O", 2L), (2L, "F", 1L), (3L, "O", 1L)))
  }

  test("valid_to chains to the next version's valid_from; last is open") {
    val k1 = hist.filter(_._1 == 1L)
    assert(k1.map(_._4).toSeq === Seq(1, 3, 4))
    assert(k1.map(_._5).toSeq === Seq(Some(3), Some(4), None))
    assert(k1.map(_._7).toSeq === Seq(false, false, true))
  }

  test("single-observation key yields one open version") {
    val k2 = hist.filter(_._1 == 2L)
    assert(k2.toSeq === Seq((2L, 1L, "F", 1, None, 1L, true)))
  }

  test("null runs compact like values (null-safe comparison)") {
    val k3 = hist.filter(_._1 == 3L)
    assert(k3.map(t => (t._3, t._6, t._7)).toSeq ===
      Seq((null, 2L, false), ("P", 1L, true)))
  }
}
