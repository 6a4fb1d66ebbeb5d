package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared euclidean distance over two double arrays — the
  * codegen path for the k-means / IVF / PQ assignment inner loops.
  * Accumulation is left-to-right into a double, exactly the HOF twin
  * `aggregate(zip_with(a,b,(x-y)²), 0.0, +)` (SimilaritySpec proves
  * bit-equality), so assignment argmins and every oracle are
  * unchanged. Length mismatch → null, matching zip_with padding.
  */
case class SqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist requires array<double> args, got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (aa.numElements() != bb.numElements()) null
    else SqDist.compute(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sqRes")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.lang.Double $r = graft.functions.SqDist.compute($a, $b);
         |  if ($r == null) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $r.doubleValue(); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {

  /** Null element → null (HOF-fold parity); check fused in the loop. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def sq_dist(a: Column, b: Column): Column =
    shims.column(SqDist(shims.expression(a), shims.expression(b)))
}
