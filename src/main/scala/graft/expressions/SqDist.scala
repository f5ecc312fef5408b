package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared Euclidean distance of two numeric array columns as a native
  * codegen'd expression: a tight primitive loop per row.
  *
  * The composed form — `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0.0, acc+v)` — allocates an intermediate array and interprets the
  * lambdas per element. That was tolerable while the k-means E-step ran
  * against 8 centroids; with the corpus-scaled list count (k ~ n/1024,
  * [[graft.sim.Similarity.scaledListCount]]) the E-step scores n*k
  * vector/centroid rows and the interpreted lambdas become the
  * bottleneck (the same ~20x gap [[DotProduct]] measured on the
  * brute-force near-dup scan). Accumulation order (sequential
  * left-to-right over (x-y)^2 terms) matches the fold form bit-for-bit
  * — the SAME double additions in the SAME order — so every assignment
  * argmin, and therefore oracle parity, is unchanged. Array elements
  * must be non-null (embedding vectors / centroid means).
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other =>
      throw new IllegalArgumentException(s"sqdist over $other unsupported")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), ba.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (rf) ba.getFloat(i).toDouble else ba.getDouble(i)
      val d = x - y
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $sum = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = ((double) $getA) - ((double) $getB);
          $sum += $d * $d;
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  def sqDist(a: Column, b: Column): Column =
    GraftExprBridge.toColumn(SqDist(
      GraftExprBridge.toExpression(a), GraftExprBridge.toExpression(b)))
}
