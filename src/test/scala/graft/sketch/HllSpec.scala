package graft.sketch

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HllSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def estimateOf(values: Seq[String]): Double = {
    val df = values.toDF("v").withColumn("g", lit("g"))
    val regs = Hll.registers(df, col("v"), Seq(col("g")))
    Hll.estimate(regs, Seq("g")).collect()(0).getAs[Double]("est_hll")
  }

  test("estimate is within 10% on 5000 distinct values") {
    val est = estimateOf((1 to 5000).map(i => s"value-$i"))
    assert(math.abs(est - 5000) / 5000.0 < 0.10, s"est=$est")
  }

  test("small-range correction kicks in for tiny cardinalities") {
    val est = estimateOf((1 to 40).map(i => s"v$i"))
    assert(math.abs(est - 40) / 40.0 < 0.25, s"est=$est")
  }

  test("duplicates do not change the sketch") {
    val once = estimateOf((1 to 300).map(i => s"x$i"))
    val thrice = estimateOf(Seq.fill(3)((1 to 300).map(i => s"x$i")).flatten)
    assert(once === thrice)
  }

  test("empty input estimates zero (global no-group aggregate)") {
    val df = Seq.empty[String].toDF("v")
    val regs = Hll.registers(df, col("v"), Seq.empty)
    val row = Hll.estimate(regs, Seq.empty).collect()(0)
    assert(row.getAs[Long]("zero_registers") === 256L)
    assert(row.getAs[Double]("est_hll") === 0.0)
  }

  test("max-merging shard registers equals sketching the union") {
    val a = (1 to 2000).map(i => s"k$i")
    val b = (1500 to 3500).map(i => s"k$i")
    def regsFor(vs: Seq[String]) =
      Hll.registers(vs.toDF("v").withColumn("g", lit("g")),
        col("v"), Seq(col("g")))
    val merged = regsFor(a).unionByName(regsFor(b))
      .groupBy("g", "reg").agg(max("rho").as("rho"))
    val whole = regsFor(a ++ b)
    val em = Hll.estimate(merged, Seq("g")).collect()(0).getAs[Double]("est_hll")
    val ew = Hll.estimate(whole, Seq("g")).collect()(0).getAs[Double]("est_hll")
    assert(em === ew)
  }
}
