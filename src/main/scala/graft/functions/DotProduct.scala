package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two double arrays — the codegen path for
  * Similarity.dotCol/normCol (every embedding operator's inner loop:
  * cosine top-k, kNN join, IVF/PQ ANN, MMR, SemDeDup, embedding
  * dedup, doc similarity). The HOF twin
  * `aggregate(zip_with(a,b,x·y), 0.0, +)` is CodegenFallback —
  * interpreted per dimension with a boxed accumulator.
  *
  * Accumulation is left-to-right into a double, exactly the HOF
  * fold's (and DuckDB list_sum's) order, so results are
  * bit-identical and every oracle is unchanged (SimilaritySpec
  * proves it). Length mismatch → null, matching zip_with's null
  * padding propagating through the fold.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<double> args, got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (aa.numElements() != bb.numElements()) null
    else DotProduct.compute(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.lang.Double $r = graft.functions.DotProduct.compute($a, $b);
         |  if ($r == null) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $r.doubleValue(); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Returns null when any element is NULL — the HOF twin (aggregate
    * over zip_with) null-poisons the fold, and reading the slot as
    * 0.0 would silently mis-score exactly the dirty rows the vector
    * screen exists to drop. The check rides the SAME loop as the
    * arithmetic (one traversal, one bitmask test per slot).
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  def dot_product(a: Column, b: Column): Column =
    shims.column(DotProduct(shims.expression(a), shims.expression(b)))
}
