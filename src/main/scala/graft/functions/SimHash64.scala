package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash over a token array — the bench/scale path for
  * Dedup (SURVEY §2/§5): one tight generated loop per row instead of a
  * per-bit HOF fold (60 array passes). 60 bits keeps the signature in
  * a non-negative BIGINT on every engine, so the DuckDB oracle can
  * replay the identical maths (md5-hex prefix → int, bit votes, sign).
  *
  * Token hash basis: first 15 hex chars of md5(token) as a long —
  * byte-identical to `conv(substring(md5(w),1,15),16,10)` in Spark SQL
  * and `CAST('0x'||substr(md5(w),1,15) AS BIGINT)` in DuckDB.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash64.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  val Bits = 60

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** h60(token): first 15 hex chars of md5 as long (0 ≤ h < 2^60). */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** SimHash over the token array: per-bit majority vote of ±1. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash60(arr.getUTF8String(i))
        var b = 0
        while (b < Bits) {
          votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column API: simhash64(tokensArrayCol). */
  def simhash64(tokens: Column): Column =
    shims.column(SimHash64(shims.expression(tokens)))

  /** SQL registration: SELECT simhash64(split(text, ' ')) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
}
