package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the 32-bit SimHash over token hashes
  * (bit j set iff Σ tokens ±1-by-bit-j is positive) — the per-document
  * kernel of the Hamming-space dedup queries (dd5/dd10).
  *
  * Why a custom Expression: the composable form folds a 32-slot accumulator
  * through three interpreted HOF lambdas, allocating two 32-arrays per
  * TOKEN. This is one 32×n loop on a stack-local array.
  *
  * Semantics mirror the HOF formulation exactly (asserted in
  * MinHashSigSpec): empty input → 0; ANY null element collapses the
  * accumulator → 0 (the fold's null-poisoned slots all fail `> 0`);
  * null input → null. The ±1 weight uses the same truncated-division
  * arithmetic as the Column form, so any input domain agrees bit-for-bit.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got " +
        child.dataType.catalogString)
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(hs: Any): Any =
    SimHash32.hash(hs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.SimHash32.hash($h);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {

  def hash(hs: ArrayData): Long = {
    val n = hs.numElements()
    val acc = new Array[Long](32)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return 0L // null element poisons the fold → 0
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        // same truncated-division arithmetic as the Column formulation
        acc(j) += (h / (1L << j)) % 2 * 2 - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (acc(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
