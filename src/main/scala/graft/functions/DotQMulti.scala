package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Batched integer dot product: one corpus vector against a whole BATCH of
  * query vectors in a single codegen'd pass — `array<bigint> x
  * array<array<bigint>> -> array<bigint>`.
  *
  * Why: the broadcast-join formulation of multi-query kNN (sim1) duplicates
  * every corpus ROW once per query before scoring — Q x |corpus| wide rows
  * (each dragging the full quantized vector through the join output) exist
  * just to feed Q independent [[DotQ]] calls. Scoring against the batch
  * FIRST means the corpus row is materialized once, the vector is read from
  * memory once for all Q dots (cache-friendly inner loop), and only the
  * slim (pos, dot) pairs are exploded afterwards. Same exact integer math,
  * same ranking determinism.
  *
  * Per-element null semantics mirror [[DotQ]]: a null query vector, a
  * length mismatch, or a null element yields a null SLOT (not a null
  * result), so one bad query cannot erase the whole batch.
  */
case class DotQMulti(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_q_multi"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotQMulti.dots(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotQMulti.dots($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQMulti =
    copy(left = newLeft, right = newRight)
}

object DotQMulti {
  /** One pass: `a . qs[i]` for every i; null slots follow [[DotQ.dot]]. */
  def dots(a: ArrayData, qs: ArrayData): ArrayData = {
    val out = new Array[Any](qs.numElements())
    var i = 0
    while (i < qs.numElements()) {
      out(i) =
        if (qs.isNullAt(i)) null
        else DotQ.dot(a, qs.getArray(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
