package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram builders — the codegen twins of the remaining
  * interpreted gram chains (`transform(sequence(...), i ->
  * concat_ws(' ', slice(words, i+1, n)))` and friends), which are
  * CodegenFallback per position with an md5/concat sub-tree evaluated
  * interpretively. Callers guarantee size(words) >= n (every call
  * site filters first — the HOF twins error on shorter inputs via
  * slice(0), so no real row ever has fewer words); for m < n these
  * return the empty array.
  *
  * Three shapes, each proved row-equal to its HOF twin by
  * PropertySpec on adversarial corpora:
  *  - WordNgrams:       all n-grams (non-distinct, in order)
  *  - GramHashStructs:  (n, first-4-md5-bytes-unsigned) structs per
  *                      position — q_repetition's counting key
  *  - DistinctGramMd5:  distinct md5 hex strings, first-occurrence
  *                      order — the decontamination / novelty key
  */
object GramHashes {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private[functions] def md5Bytes(s: String): Array[Byte] = {
    val md = digest.get()
    md.reset()
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Unsigned 32-bit value of the first 4 md5 bytes — identical to
    * conv(substring(md5(x), 1, 8), 16, 10).
    */
  private[functions] def md5Prefix(s: String): Long = {
    val d = md5Bytes(s)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  private[functions] def md5Hex(s: String): String = {
    val d = md5Bytes(s)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The i-th n-gram of `words`, joined by a single space. NULL
    * elements are skipped exactly as concat_ws skips them (separator
    * only between kept words) — the HOF twins build grams through
    * concat_ws, so this is what keeps row-equality on dirty arrays
    * instead of an NPE task failure.
    */
  private[functions] def gramAt(words: ArrayData, i: Int, n: Int,
      sb: java.lang.StringBuilder): String = {
    sb.setLength(0)
    var j = 0
    var appended = false // empty strings still count (concat_ws keeps them)
    while (j < n) {
      val w = words.getUTF8String(i + j)
      if (w != null) {
        if (appended) sb.append(' ')
        sb.append(w.toString)
        appended = true
      }
      j += 1
    }
    sb.toString
  }
}

abstract class GramExpression extends UnaryExpression {
  def n: Int
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
}

case class WordNgrams(child: Expression, n: Int) extends GramExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.WordNgrams.compute($w, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val cnt = math.max(0, m - n + 1)
    val out = new Array[Any](cnt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      out(i) = UTF8String.fromString(GramHashes.gramAt(words, i, n, sb))
      i += 1
    }
    new GenericArrayData(out)
  }
  def word_ngrams(words: Column, n: Int): Column =
    shims.column(WordNgrams(shims.expression(words), n))
}

case class GramHashStructs(child: Expression, n: Int) extends GramExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("gh", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "gram_hash_structs"
  override def nullSafeEval(input: Any): Any =
    GramHashStructs.compute(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.GramHashStructs.compute($w, $n);")
  override protected def withNewChildInternal(newChild: Expression): GramHashStructs =
    copy(child = newChild)
}

object GramHashStructs {
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val cnt = math.max(0, m - n + 1)
    val out = new Array[Any](cnt)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      out(i) = new GenericInternalRow(Array[Any](
        n, GramHashes.md5Prefix(GramHashes.gramAt(words, i, n, sb))))
      i += 1
    }
    new GenericArrayData(out)
  }
  def gram_hash_structs(words: Column, n: Int): Column =
    shims.column(GramHashStructs(shims.expression(words), n))
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03) in ONE codegen'd JVM pass: k-gram md5-prefix hashes →
  * min of every w-hash window → distinct mins in first-occurrence
  * order. Bit-identical to the HOF twin
  * `array_distinct(transform(sequence(0, nh-w), j ->
  * array_min(slice(hs, j+1, w))))` over
  * `hs = transform(sequence(0, m-k), i ->
  * conv(substring(md5(gram_i), 1, 8), 16, 10))` — proved by
  * PropertySpec on generated corpora — but without the two
  * interpreted lambda chains (CodegenFallback per position with an
  * md5/concat sub-tree each). Returns the empty array when the doc
  * has fewer than k+w-1 words (callers filter first).
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends GramExpression {
  override def n: Int = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"
  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[ArrayData], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words =>
      s"${ev.value} = graft.functions.WinnowFps.compute($words, $k, $w);")
  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  def compute(words: ArrayData, k: Int, w: Int): ArrayData = {
    val m = words.numElements()
    val nh = m - k + 1
    if (nh < w) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](nh)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nh) {
      hs(i) = GramHashes.md5Prefix(GramHashes.gramAt(words, i, k, sb))
      i += 1
    }
    // w is tiny (4): the direct O(nh*w) scan beats a deque's boxing
    val seen = new java.util.LinkedHashSet[java.lang.Long]((nh max 4) * 2)
    var j = 0
    while (j <= nh - w) {
      var mn = hs(j)
      var t = 1
      while (t < w) { if (hs(j + t) < mn) mn = hs(j + t); t += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }
  def winnow_fps(words: Column, k: Int, w: Int): Column =
    shims.column(WinnowFps(shims.expression(words), k, w))
}

case class DistinctGramMd5(child: Expression, n: Int) extends GramExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_gram_md5"
  override def nullSafeEval(input: Any): Any =
    DistinctGramMd5.compute(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.DistinctGramMd5.compute($w, $n);")
  override protected def withNewChildInternal(newChild: Expression): DistinctGramMd5 =
    copy(child = newChild)
}

object DistinctGramMd5 {
  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val cnt = math.max(0, m - n + 1)
    val seen = new java.util.LinkedHashSet[String]((cnt max 4) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      seen.add(GramHashes.md5Hex(GramHashes.gramAt(words, i, n, sb)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
  def distinct_gram_md5(words: Column, n: Int): Column =
    shims.column(DistinctGramMd5(shims.expression(words), n))
}
