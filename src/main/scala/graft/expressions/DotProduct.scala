package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Double-precision dot product of two numeric array columns as a native
  * codegen'd expression: a tight primitive loop per row.
  *
  * The composed form — `aggregate(zip_with(a, b, (x,y) -> x*y), ...)` —
  * allocates an intermediate array and interprets the lambdas per
  * element, which measured ~20x slower on the brute-force near-dup scan
  * (98s -> ~5s at sf0.1). Accumulation order (sequential left-to-right)
  * matches the fold form bit-for-bit, so oracle parity is unchanged.
  * Array elements must be non-null (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other =>
      throw new IllegalArgumentException(s"dot over $other unsupported")
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
      sum += x * y
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
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $sum = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $sum += ((double) $getA) * ((double) $getB);
        }
        ${ev.value} = $sum;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: Column, b: Column): Column =
    GraftExprBridge.toColumn(DotProduct(
      GraftExprBridge.toExpression(a), GraftExprBridge.toExpression(b)))
}
