package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native signed-random-projection bucket id: bit j of the result is
  * the sign of the dot product of the input vector with hyperplane
  * `planes(j)` — all planes of one LSH table in a single fused loop,
  * versus one zip_with+aggregate HOF fold (two array allocations) per
  * plane on the portable path.
  *
  * The per-plane accumulation is the same left-to-right fold into a
  * double as the HOF path and the DuckDB `list_sum(list_transform …)`
  * oracle, so buckets are bit-identical across all three
  * (SimilaritySpec asserts native == HOF on the full corpus).
  */
case class SrpSig(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_sig requires an array<double> arg, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_sig"

  override def nullSafeEval(v: Any): Any =
    SrpSig.compute(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SrpSig.compute($v, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSig =
    copy(child = newChild)
}

object SrpSig {

  /** One fused loop over all planes of a table; per-plane partial sums
    * accumulate left-to-right (fold parity with the HOF/oracle path).
    */
  def compute(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var j = 0
    while (j < planes.length) {
      val w = planes(j)
      val n = math.min(v.numElements(), w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * w(i); i += 1 }
      if (s > 0) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  def srp_sig(v: Column, planes: Array[Array[Double]]): Column =
    shims.column(SrpSig(shims.expression(v), planes))
}
