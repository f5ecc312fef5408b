package graft.functions

import graft.expressions.CutBucket
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator

/** Custom function surface (SURVEY §2.10): a single-pass typed entropy
  * aggregator (the reference's vectorized `_entropy_vectorized`,
  * house_predict.py:228-237, as a distributed merge-able Aggregator) and
  * SQL registration for the native `cut_bucket` expression.
  */
object GraftFunctions {

  /** Shannon entropy (log2) over a label column in ONE pass: buffer is a
    * class-count map, merge is map-union — partial aggregation works
    * map-side like any built-in agg.
    */
  class EntropyAggregator extends Aggregator[Long, Map[Long, Long], Double] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(b: Map[Long, Long], a: Long): Map[Long, Long] =
      b.updated(a, b.getOrElse(a, 0L) + 1L)
    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(m: Map[Long, Long]): Double = {
      val n = m.values.sum.toDouble
      -m.values.foldLeft(0.0) { (acc, c) =>
        val p = c / n
        acc + (if (c > 0) p * (math.log(p) / math.log(2)) else 0.0)
      }
    }
    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val entropy = new EntropyAggregator

  /** Register SQL-callable custom functions on a session:
    * `cut_bucket(x, array(e0, e1, ...))` and `entropy_agg(label)`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cut_bucket",
      exprs => {
        require(exprs.length == 2, "cut_bucket(value, edges)")
        val edges = exprs(1) match {
          case lit @ Literal(a: ArrayData, _) =>
            a.toDoubleArray().toSeq
          case e if e.foldable =>
            e.eval().asInstanceOf[ArrayData].toDoubleArray().toSeq
          case other =>
            throw new IllegalArgumentException(
              s"cut_bucket edges must be a literal array, got $other")
        }
        CutBucket(exprs.head, edges)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => {
        require(exprs.length == 2, "dot_product(a, b)")
        graft.expressions.DotProduct(exprs(0), exprs(1))
      },
      "built-in")
    spark.udf.register("entropy_agg", org.apache.spark.sql.functions.udaf(entropy))
  }
}
