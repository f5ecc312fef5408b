package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Bloom-filter bit test: child evaluates to a bucket position
  * (long in [0, 64 * bits.length)); the expression answers whether that
  * bit is set in the filter's packed word array.
  *
  * The bit array rides along as a codegen reference object, so probing a
  * 100 TB scan costs one array index + shift per row inside whole-stage
  * codegen — no join, no broadcast relation, no UDF boxing. This is the
  * word-packed twin of `graft.sketch.BloomFilter`'s relational row form
  * (that one exists to be oracle-replayable; this one is the hot path).
  * Out-of-range positions and null inputs answer false (a filter must
  * never produce false negatives for valid probes; callers derive the
  * position with `pmod`, which keeps it in range).
  */
case class BloomMightContain(child: Expression, bits: Array[Long])
    extends UnaryExpression {
  require(bits.nonEmpty)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else {
      val p = v.asInstanceOf[Long]
      p >= 0 && p < bits.length.toLong * 64 &&
        ((bits((p >> 6).toInt) >>> (p & 63)) & 1L) == 1L
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val c = child.genCode(ctx)
    val p = ctx.freshName("p")
    ev.copy(
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          long $p = ${c.value};
          ${ev.value} = $p >= 0 && $p < ${bitsRef}.length * 64L
            && ((${bitsRef}[(int) ($p >> 6)] >>> ($p & 63)) & 1L) == 1L;
        }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def column(position: Column, bits: Array[Long]): Column =
    GraftExprBridge.toColumn(
      BloomMightContain(GraftExprBridge.toExpression(position), bits))
}
