package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys (Z-order / Morton interleave).
  *
  * At 100 TB the scan cost of a two-predicate workload is decided by
  * file layout, not operators: sorting by one key clusters that key
  * only, while sorting by the Z-value of BOTH keys gives every file a
  * narrow min/max rectangle in each dimension, so parquet row-group
  * stats prune scans on either predicate. The production write path is
  * `df.repartitionByRange(n, zCol).sortWithinPartitions(zCol).write` —
  * pure plan operations; the interleave itself is a codegen'd integer
  * expression with no shuffle of its own.
  */
object Layout {

  /** `bits`-bit Morton interleave of two non-negative integer columns:
    * bit i of `a` lands at output position 2i, bit i of `b` at 2i+1.
    * Pure long arithmetic (shift/and/add), bit-identical in any engine;
    * values must fit in `bits` bits (callers pick the grid).
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits)
      .map(i =>
        shiftleft(shiftrightunsigned(al, i).bitwiseAND(1L), 2 * i) +
          shiftleft(shiftrightunsigned(bl, i).bitwiseAND(1L), 2 * i + 1))
      .reduce(_ + _)
  }

  /** The same interleave as a SQL fragment (for differential oracles):
    * unrolled `((a >> i) & 1) << 2i | ...` sum over the bit positions.
    */
  def zValueSql(aExpr: String, bExpr: String, bits: Int): String =
    (0 until bits)
      .map(i => s"((($aExpr >> $i) & 1) << ${2 * i}) + " +
        s"((($bExpr >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " + ", ")")
}
