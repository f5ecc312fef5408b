package graft.expressions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-row text-hashing kernels for the DSIR featurizer and the
  * span-dedup fingerprinter. Both replace composed chains whose per-gram
  * lambdas (`transform(... md5 ... conv ...)`) run on the interpreted
  * higher-order-function path and whose `conv(substring(md5(...)))`
  * steps allocate a hex string per gram just to parse 60 bits out of it
  * — the digest bytes carry those bits directly. Values are pinned
  * bit-identical to the composed forms by TextHashKernelsSpec.
  */
object TextHashKernels {

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of the digest parsed base-16 (60 bits) — the
    * compiled form of `conv(substring(md5(x), 1, 15), 16, 10)`.
    */
  private def hash60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >> 4)
  }

  /** Token byte ranges of `split(text, " ")` with Spark's limit -1
    * semantics: split at EVERY 0x20 byte (a space byte never occurs
    * inside a UTF-8 multi-byte sequence), keep empty tokens including a
    * trailing one. Returns (starts, ends, count) over `bytes`.
    */
  def spaceTokens(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = bytes.length
    var count = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) count += 1; i += 1 }
    val starts = new Array[Int](count)
    val ends = new Array[Int](count)
    var tok = 0
    var start = 0
    i = 0
    while (i < n) {
      if (bytes(i) == 0x20) {
        starts(tok) = start; ends(tok) = i; tok += 1; start = i + 1
      }
      i += 1
    }
    starts(tok) = start; ends(tok) = n
    (starts, ends, count)
  }

  /** Hashed unigram+bigram buckets of a doc, one array element per gram
    * OCCURRENCE in the featurizer's order (unigrams then bigrams) — the
    * compiled form of [[graft.text.Dsir.hashedGrams]]'s per-gram
    * `md5Hash60(gram, seed) % buckets` over
    * `concat(split(text," "), zip_with(words, words[1:], concat(" ")))`.
    * The md5 input for a bigram is `w_i + " " + w_{i+1} + "|seed"`,
    * fed to the digest as byte slices of the original string — zero
    * per-gram string allocation.
    */
  case class GramBuckets(child: Expression, seed: Int, buckets: Int)
      extends UnaryExpression with CodegenFallback {

    private val sepBytes =
      ("|" + seed).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    private val spaceByte = Array[Byte](0x20)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(t: Any): Any = {
      val bytes = t.asInstanceOf[UTF8String].getBytes
      val (starts, ends, n) = spaceTokens(bytes)
      val md = digestTL.get()
      val nBi = if (n > 1) n - 1 else 0
      val out = new Array[Long](n + nBi)
      var i = 0
      while (i < n) {
        md.reset()
        md.update(bytes, starts(i), ends(i) - starts(i))
        md.update(sepBytes)
        out(i) = (hash60(md.digest()) % buckets + buckets) % buckets
        i += 1
      }
      i = 0
      while (i < nBi) {
        md.reset()
        // bigram = w_i + " " + w_{i+1}: tokens are adjacent byte ranges
        // separated by exactly one space, so this is the original byte
        // span starts(i)..ends(i+1)
        md.update(bytes, starts(i), ends(i + 1) - starts(i))
        md.update(sepBytes)
        out(n + i) = (hash60(md.digest()) % buckets + buckets) % buckets
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): GramBuckets = copy(child = newChild)
  }

  /** k-token window fingerprints of a doc — the compiled form of
    * [[graft.dedup.SpanDedup.spanFingerprints]]'s
    * `conv(substring(md5(array_join(slice(toks, i, k), " ")), 1, 15),
    * 16, 10)` per window: tokens split on single spaces re-joined with
    * one space ARE the original byte span, so each fingerprint is one
    * digest over a byte range. Documents with fewer than k tokens yield
    * an empty array (the composed form's `when(size >= k, ...)` branch).
    */
  case class SpanFps(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(t: Any): Any = {
      val bytes = t.asInstanceOf[UTF8String].getBytes
      val (starts, ends, n) = spaceTokens(bytes)
      if (n < k) return new GenericArrayData(Array.emptyLongArray)
      val md = digestTL.get()
      val out = new Array[Long](n - k + 1)
      var i = 0
      while (i <= n - k) {
        md.reset()
        md.update(bytes, starts(i), ends(i + k - 1) - starts(i))
        out(i) = hash60(md.digest())
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): SpanFps = copy(child = newChild)
  }

  /** k-token window STRINGS of a doc — the compiled form of
    * `transform(sequence(...), i -> array_join(slice(split(text, " "),
    * i, k), " "))` (equivalently `concat_ws` of adjacent tokens):
    * tokens split on single spaces re-joined with one space ARE the
    * original byte span, so each window is one byte-range slice, no
    * join allocation, no interpreted lambda. Documents with fewer than
    * k tokens yield an EMPTY array (callers' `size >= k` filters and
    * `if(size < k, array(), ...)` guards behave identically on the
    * empty result).
    */
  case class SpanGrams(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)

    override def nullSafeEval(t: Any): Any = {
      val bytes = t.asInstanceOf[UTF8String].getBytes
      val (starts, ends, n) = spaceTokens(bytes)
      if (n < k) return new GenericArrayData(new Array[Any](0))
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) {
        out(i) = UTF8String.fromBytes(
          bytes, starts(i), ends(i + k - 1) - starts(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): SpanGrams = copy(child = newChild)
  }

  def spanGrams(text: Column, k: Int): Column =
    GraftExprBridge.toColumn(
      SpanGrams(GraftExprBridge.toExpression(text), k))

  def gramBuckets(text: Column, seed: Int, buckets: Int): Column =
    GraftExprBridge.toColumn(
      GramBuckets(GraftExprBridge.toExpression(text), seed, buckets))

  def spanFps(text: Column, k: Int): Column =
    GraftExprBridge.toColumn(
      SpanFps(GraftExprBridge.toExpression(text), k))
}
