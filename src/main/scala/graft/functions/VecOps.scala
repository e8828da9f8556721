package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector kernels for the similarity-search operators. A native Catalyst
  * expression (single static call inside whole-stage codegen) instead of
  * `aggregate(zip_with(...))` lambda folds — the higher-order functions
  * evaluate interpreted per element, which dominated the brute-force
  * cosine join (~20× slower at sf0.1).
  *
  * The loop accumulates left-to-right from 0.0 — the exact IEEE add order
  * of both the previous fold and the DuckDB oracle's `list_reduce`, so
  * results stay bit-identical.
  */
object VecOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** `dot(ARRAY<DOUBLE>, ARRAY<DOUBLE>) -> DOUBLE`, codegen'd. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}

object VecDot {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
