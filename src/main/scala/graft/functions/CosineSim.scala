package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two double arrays — one fused loop
  * (dot + both norms) in generated code, versus three HOF folds.
  * The accumulation order matches the HOF/`list_sum` folds
  * (left-to-right into doubles), so results are bit-identical to the
  * portable path and the DuckDB oracle.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<double> args, got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  // nullable even for non-null children: dimension mismatch → null
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (aa.numElements() != bb.numElements()) null
    else CosineSim.compute(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosRes")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.lang.Double $r = graft.functions.CosineSim.compute($a, $b);
         |  if ($r == null) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $r.doubleValue(); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Fused dot/norm loop, left-to-right accumulation (fold parity).
    * Callers guarantee equal lengths (mismatch → null upstream, the
    * same outcome as zip_with's null padding propagating through the
    * fold). Zero-norm inputs yield NaN — identical to the HOF path's
    * 0.0/0.0.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // null element → null result (HOF-fold parity), fused in the loop
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def cosine_sim(a: Column, b: Column): Column =
    shims.column(CosineSim(shims.expression(a), shims.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
}
