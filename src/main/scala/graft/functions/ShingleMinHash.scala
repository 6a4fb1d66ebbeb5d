package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen twins of the dedup family's two per-row hot loops
  * (operators.Dedup): word-n-gram shingle construction and the
  * K-lane MinHash signature fold. Both were Catalyst HOF chains
  * (transform/slice/concat_ws and aggregate/zip_with), which are
  * CodegenFallback — interpreted per word/per shingle — and together
  * dominated the CPU of every MinHash-based operator (q_dedup_minhash,
  * q_dedup_temporal, q_source_minhash, q_minhash_est, the incremental
  * and cluster variants). Interpreted-eval CPU is also what driver-load
  * benches starve first (ddmh 15.2 s under driver load vs ~2 s solo).
  *
  * Semantics are EXACTLY the HOF twins' (DedupSpec proves equality):
  *  - shingles: distinct 3-word windows of split(text, ' ') (empties
  *    kept), joined by ' ', first-occurrence order (array_distinct).
  *  - minhash: base hash = first 8 md5 hex digits of the shingle as
  *    an unsigned 32-bit value (conv(substring(md5(x),1,8),16,10)),
  *    lane j minimum of (h·A_j + B_j) mod P over all shingles, with
  *    A_j = 1000003 + 7919·j, B_j = 12345 + 911·j, P = 1000000007,
  *    lanes initialized to P.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.WordShingles.compute($w, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  def compute(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    // first-occurrence order, exactly array_distinct's
    val seen = new java.util.LinkedHashSet[String]((m max 4) * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = 0
      // NULL words are skipped, concat_ws-style (see GramHashes.gramAt);
      // empty strings still count as appended (concat_ws keeps them)
      var appended = false
      while (j < n) {
        val w = words.getUTF8String(i + j)
        if (w != null) {
          if (appended) sb.append(' ')
          sb.append(w.toString)
          appended = true
        }
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def word_shingles(words: Column, n: Int): Column =
    shims.column(WordShingles(shims.expression(words), n))
}

case class MinHashSig(child: Expression, k: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.MinHashSig.compute($w, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  val P = 1000000007L

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Unsigned 32-bit value of the first 4 md5 bytes — identical to
    * conv(substring(md5(x), 1, 8), 16, 10).
    */
  private def baseHash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(P)
    val m = shingles.numElements()
    var i = 0
    while (i < m) {
      // a NULL shingle contributes nothing (md5(NULL) is NULL on the
      // HOF path and aggregate minima skip it) — not an NPE
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h = baseHash(s)
        var j = 0
        while (j < k) {
          val v = (h * (1000003L + 7919L * j) + 12345L + 911L * j) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  def minhash_sig(shingles: Column, k: Int): Column =
    shims.column(MinHashSig(shims.expression(shingles), k))
}
