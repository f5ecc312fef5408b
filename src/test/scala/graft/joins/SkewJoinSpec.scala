package graft.joins

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under skew") {
    // key 1 owns 90% of the big side
    val big = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => (i % 7 + 2L, s"cold$i"))).toDF("k", "payload")
    val small = Seq((1L, "dim1"), (2L, "dim2"), (5L, "dim5")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() == plain.count())
    val a = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = salted.select(plain.columns.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(a == b) // identical row multisets
  }
}
