package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row shingling + MinHash kernels.
  *
  * The composed forms — `array_distinct(transform(sequence(...), i ->
  * substring(text, i, k)))` and 32x `array_min(transform(hs, h ->
  * (a*h+b) % p))` — evaluate every lambda through the interpreted
  * higher-order-function path (HigherOrderFunction has no codegen), and
  * `substring(text, i, k)` re-scans the string from the start per call
  * (UTF-8 char positions), making shingling O(n^2) in document length.
  * Measured on the r16 box: the interpreted 32-perm min made the per-row
  * minhash REGRESS vs the exploded+codegen-aggregated form
  * (minhash_estimate_error 2.4 -> 5.9 s) — these kernels keep the
  * shuffle-free per-row shape but run tight JIT'd loops instead
  * (guide §1.2 step 2: per-task work, after the algorithm shape is
  * right).
  *
  * Edge semantics are bit-compatible with the composed form:
  * `sequence(1, greatest(len-k+1, 0))` DESCENDS to [1, 0] when the text
  * has fewer than k chars (Spark sequence with start > stop steps -1),
  * and both i=1 and i=0 then substring to the whole text — so a short
  * or empty document yields exactly one shingle (the text itself, ""
  * included), never an empty set. Positions are CHARACTER positions
  * (UTF-8 aware), matching substring().
  */
object Shingles {

  /** Distinct character k-shingles of an UTF8String, first-occurrence
    * order (array_distinct's order), one O(bytes) scan: char start
    * offsets are computed once, each shingle is one byte-range copy.
    */
  def distinctShingles(
      text: UTF8String, k: Int): java.util.LinkedHashSet[UTF8String] = {
    val bytes = text.getBytes
    // char start offsets (UTF-8): offsets(c) = byte offset of char c
    val nBytes = bytes.length
    val starts = new Array[Int](nBytes + 1)
    var nChars = 0
    var off = 0
    while (off < nBytes) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    starts(nChars) = nBytes
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (nChars <= k) {
      // composed-form edge: i in [1, 0] both yield the whole text
      out.add(text)
    } else {
      var c = 0
      val last = nChars - k
      while (c <= last) {
        out.add(UTF8String.fromBytes(
          bytes, starts(c), starts(c + k) - starts(c)))
        c += 1
      }
    }
    out
  }

  /** First 15 hex chars of md5 parsed base-16 (60 bits), as
    * `conv(substring(md5(s), 1, 15), 16, 10)` computes it: bytes 0..6
    * fully plus the high nibble of byte 7.
    */
  def md5Hash60(digest: java.security.MessageDigest, s: UTF8String): Long = {
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >> 4)
  }

  private val digestTL =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  def digest(): java.security.MessageDigest = digestTL.get()
}

/** `array_distinct(transform(sequence(1, greatest(length(t)-k+1, 0)),
  * i -> substring(t, i, k)))` as one compiled scan (see [[Shingles]]).
  */
case class ShingleSet(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any = {
    val set = Shingles.distinctShingles(t.asInstanceOf[UTF8String], k)
    val arr = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Non-distinct sibling of [[ShingleSet]]: every k-gram OCCURRENCE in
  * position order — `transform(sequence(1, greatest(len-k+1, 0)),
  * i -> substring(t, i, k))` compiled, INCLUDING its short-text edge:
  * the descending [1, 0] sequence yields the whole text TWICE when the
  * text has fewer than k chars (both positions substring to the full
  * string). Feeds occurrence-counting consumers (tf postings).
  */
case class ShingleList(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any = {
    val text = t.asInstanceOf[UTF8String]
    val bytes = text.getBytes
    val nBytes = bytes.length
    val starts = new Array[Int](nBytes + 1)
    var nChars = 0
    var off = 0
    while (off < nBytes) {
      starts(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    starts(nChars) = nBytes
    if (nChars < k) {
      // composed-form edge: i in [1, 0], both the whole text
      new GenericArrayData(Array[Any](text, text))
    } else {
      val out = new Array[Any](nChars - k + 1)
      var c = 0
      while (c <= nChars - k) {
        out(c) = UTF8String.fromBytes(
          bytes, starts(c), starts(c + k) - starts(c))
        c += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleList =
    copy(child = newChild)
}

/** MinHash signature of a document in ONE compiled pass: distinct
  * k-shingles -> md5-based 60-bit hash mod P31 -> running min per
  * universal-hash permutation. Exactly the values of
  * [[graft.dedup.Dedup.minhashSignaturesPerm]] over
  * [[graft.dedup.Dedup.shingleSet]] (integer arithmetic, same hash, same
  * permutation constants), without the explode, the exchange, or the
  * interpreted lambdas. Input: the text column; output: array<long> of
  * `perms.length` minima.
  */
case class MinHashSig(child: Expression, k: Int, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  private val P31 = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any = {
    val set = Shingles.distinctShingles(t.asInstanceOf[UTF8String], k)
    val n = as.length
    val aArr = as.toArray
    val bArr = bs.toArray
    val mins = Array.fill(n)(Long.MaxValue)
    val md = Shingles.digest()
    val it = set.iterator()
    while (it.hasNext) {
      val h = Shingles.md5Hash60(md, it.next()) % P31
      var i = 0
      while (i < n) {
        val v = (aArr(i) * h + bArr(i)) % P31
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object ShingleMinHash {
  def shingleSet(text: Column, k: Int): Column =
    GraftExprBridge.toColumn(
      ShingleSet(GraftExprBridge.toExpression(text), k))

  def shingleList(text: Column, k: Int): Column =
    GraftExprBridge.toColumn(
      ShingleList(GraftExprBridge.toExpression(text), k))

  def minhashSig(text: Column, k: Int, perms: Seq[(Long, Long)]): Column =
    GraftExprBridge.toColumn(MinHashSig(
      GraftExprBridge.toExpression(text), k,
      perms.map(_._1), perms.map(_._2)))
}
