package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** All ordered pairs (ids[i], ids[j]) with i < j of a SORTED id array —
  * the per-bucket pair expansion of the inverted-index near-dup joins.
  *
  * Replaces the index self-join formulation: `groupBy(key).collect_list`
  * computes the bucket AND its document frequency in one shuffle (the
  * hot-key cap becomes a `size(ids) <= maxDf` filter on the same
  * aggregate, where the self-join needed a separate df aggregation plus
  * an anti-join and shuffled the index a second time), and the pair
  * expansion is a single static call inside codegen followed by the
  * built-in (codegen'd) `explode`. Bucket size is capped upstream, so
  * the materialized pair array is at most maxDf·(maxDf-1)/2 elements.
  */
object PairGen {
  def pairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, ids.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `pair_combos(ARRAY<BIGINT>) -> ARRAY<STRUCT<d1,d2>>`, codegen'd. */
case class PairCombos(child: Expression) extends UnaryExpression {
  // PairGen.pairs reads elements via getLong and allocates n(n-1)/2
  // slots up front — reject anything but ARRAY<BIGINT> at analysis time
  // so a mistyped caller fails with a diagnostic, not a ClassCastException
  // (or an int-overflow allocation) at runtime.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_combos requires ARRAY<BIGINT>, got ${other.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(StructType(Seq(StructField("d1", LongType), StructField("d2", LongType))))
  override protected def nullSafeEval(a: Any): Any =
    PairGen.pairs(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PairGen.pairs($a)")
  override protected def withNewChildInternal(c: Expression): PairCombos = copy(c)
}

object PairCombos {
  def apply(c: Column): Column =
    ColumnBridge.column(PairCombos(ColumnBridge.expression(c)))
}
