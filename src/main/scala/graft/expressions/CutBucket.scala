package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native pandas-`cut` bucket assignment: binary search over the edge
  * array with right-closed `(a,b]` intervals, include-lowest first
  * interval, null/out-of-range -> -1.
  *
  * Semantically identical to the `when`-chain in
  * `graft.transform.BinModel`, but O(log k) per row with a single
  * codegen'd loop — a `when`-chain is O(k) comparisons and overflows the
  * JIT/codegen method-size limits once k reaches the hundreds, which a
  * quantile discretizer at 100 TB (k = 1000+ buckets) does immediately.
  * This is the preference-order (b) custom-Expression case from the build
  * brief: built-ins compose the semantics but not the asymptotics.
  */
case class CutBucket(child: Expression, edges: Seq[Double])
    extends UnaryExpression {
  require(edges.length >= 2, "need at least one bucket")

  private val edgeArr: Array[Double] = edges.toArray

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  // null input maps to -1, so do NOT short-circuit on null children
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1 else search(v.asInstanceOf[Double])
  }

  private def search(v: Double): Int = {
    if (java.lang.Double.isNaN(v) || v < edgeArr(0) ||
      v > edgeArr(edgeArr.length - 1)) return -1
    // smallest i in [1, n) with v <= edges(i); bucket = i - 1
    var lo = 1
    var hi = edgeArr.length - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= edgeArr(mid)) hi = mid else lo = mid + 1
    }
    lo - 1
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val edgesRef = ctx.addReferenceObj("edges", edgeArr, "double[]")
    val c = child.genCode(ctx)
    val v = ctx.freshName("v")
    val lo = ctx.freshName("lo")
    val hi = ctx.freshName("hi")
    val mid = ctx.freshName("mid")
    ev.copy(
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${c.code}
        int ${ev.value} = -1;
        if (!${c.isNull}) {
          double $v = ${c.value};
          if (!Double.isNaN($v) && $v >= $edgesRef[0]
              && $v <= $edgesRef[$edgesRef.length - 1]) {
            int $lo = 1;
            int $hi = $edgesRef.length - 1;
            while ($lo < $hi) {
              int $mid = ($lo + $hi) >>> 1;
              if ($v <= $edgesRef[$mid]) { $hi = $mid; } else { $lo = $mid + 1; }
            }
            ${ev.value} = $lo - 1;
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): CutBucket =
    copy(child = newChild)
}

object CutBucket {
  /** Column-level API. */
  def cutBucket(c: Column, edges: Seq[Double]): Column =
    GraftExprBridge.toColumn(
      CutBucket(GraftExprBridge.toExpression(c), edges))
}
