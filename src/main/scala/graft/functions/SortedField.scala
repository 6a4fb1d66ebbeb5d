package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Native `transform(array_sort(arr), s -> s.field)` — the
  * sort-then-project idiom every ordered re-assembly in the pipeline
  * uses (chunk text from (pos, word) pairs, mention names, rag
  * context, k-means / PCA / quantization vectors from (dim, value)
  * pairs). The HOF chain is CodegenFallback twice over (array_sort's
  * comparator lambda + transform's projection lambda, both
  * interpreted per element); this expression does one comparator
  * sort + direct field reads.
  *
  * Ordering parity: the comparator is Catalyst's OWN interpreted
  * struct ordering (TypeUtils.getInterpretedOrdering) — the ordering
  * array_sort's default comparator defines — so results are identical
  * by construction, including tie behavior (equal structs project
  * equal fields). OperatorsSpec/TextPipelineSpec pin the end-to-end
  * rows against the unchanged DuckDB oracles.
  */
case class SortedField(child: Expression, idx: Int)
  extends UnaryExpression {

  private lazy val structType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if idx >= 0 && idx < st.size =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_field requires array<struct> with field index $idx, got ${other.simpleString}")
  }

  override def dataType: DataType = {
    val f = structType(idx)
    ArrayType(f.dataType, containsNull = f.nullable)
  }
  override def prettyName: String = "sorted_field"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(structType)

  override def nullSafeEval(input: Any): Any =
    SortedField.compute(input.asInstanceOf[ArrayData], structType.size,
      ordering, structType(idx).dataType, idx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ordRef = ctx.addReferenceObj("structOrd", ordering, "scala.math.Ordering")
    val dtRef = ctx.addReferenceObj("fieldDt", structType(idx).dataType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SortedField.compute($a, ${structType.size}, " +
        s"(scala.math.Ordering) $ordRef, $dtRef, $idx);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedField =
    copy(child = newChild)
}

object SortedField {

  def compute(arr: ArrayData, numFields: Int, ord: Ordering[Any],
      fieldDt: DataType, idx: Int): ArrayData = {
    val n = arr.numElements()
    val rows = new Array[AnyRef](n)
    var i = 0
    while (i < n) { rows(i) = arr.getStruct(i, numFields); i += 1 }
    java.util.Arrays.sort(rows, ord.asInstanceOf[java.util.Comparator[AnyRef]])
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = rows(i).asInstanceOf[InternalRow].get(idx, fieldDt)
      i += 1
    }
    new GenericArrayData(out)
  }

  def sorted_field(arr: Column, idx: Int): Column =
    shims.column(SortedField(shims.expression(arr), idx))
}
