package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy longest-match subword segmentation — the codegen
  * path for operators.Tokenize (same fixed vocabulary): one generated
  * walk over the word's characters versus a CodegenFallback HOF fold
  * with seven IN-list probes per position (measured ~20× at sf0.1
  * when driven from a Generate). Piece boundaries are identical to
  * the portable fold (TokenizeSpec/OperatorsSpec assert it), so the
  * DuckDB oracle is unchanged.
  */
case class SubwordSplit(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subword_split requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_split"

  override def nullSafeEval(input: Any): Any =
    SubwordSplit.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.SubwordSplit.compute($w);")

  override protected def withNewChildInternal(newChild: Expression): SubwordSplit =
    copy(child = newChild)
}

object SubwordSplit {

  /** Vocabulary sets keyed by piece length (longest-first probing). */
  private val byLen: Array[java.util.HashSet[String]] = {
    val vocab = graft.operators.Tokenize.Subwords
    val maxLen = vocab.map(_.length).max
    val sets = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    vocab.foreach(p => sets(p.length).add(p))
    sets
  }
  private val lensDesc: Array[Int] =
    byLen.indices.filter(l => l >= 2 && !byLen(l).isEmpty).sorted.reverse.toArray

  /** Greedy walk; single-char pieces are the implicit fallback. */
  def compute(w: UTF8String): ArrayData = {
    val s = w.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var p = 0
    while (p < n) {
      var len = 1
      var li = 0
      var found = false
      while (!found && li < lensDesc.length) {
        val l = lensDesc(li)
        if (p + l <= n && byLen(l).contains(s.substring(p, p + l))) {
          len = l; found = true
        }
        li += 1
      }
      out += UTF8String.fromString(s.substring(p, p + len))
      p += len
    }
    new GenericArrayData(out.toArray)
  }

  def subword_split(w: Column): Column =
    shims.column(SubwordSplit(shims.expression(w)))
}
