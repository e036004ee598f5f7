package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the random-hyperplane LSH bucket id
  * (Charikar '02 sign buckets) over a quantized vector: bit r set iff
  * Σ_d qv[d] · coef(r, d) ≥ 0, with the deterministic integer coefficient
  * family coef(r, d) = ((2r+3)(d²+1) + 7919(r+1)(d+1)) mod 101 − 50
  * (see [[TextHash.hplaneDot]]).
  *
  * Why a custom Expression: the composable form evaluates `planes`
  * independent interpreted zip_with/aggregate folds — re-walking the
  * vector once per plane with per-element lambda dispatch. This is ONE
  * pass over the vector updating all plane accumulators (coefficients are
  * O(1) arithmetic, no table needed).
  *
  * Null semantics (asserted in MinHashSigSpec): a null element nulls every
  * plane dot, `when(null >= 0)` fails, so all bits fall to their
  * otherwise(0) → bucket 0; an EMPTY vector also yields bucket 0 (the
  * HOF's `sequence(0, size-1)` runs descending for size 0, null-padding
  * the zip and nulling the dots). On a null INPUT this expression is
  * null-safe → NULL, deliberately diverging from the HOF twin (whose
  * otherwise(0) chain swallows the null into bucket 0 — a null vector is
  * missing data, not a member of bucket 0).
  */
case class LshBucketExpr(child: Expression, planes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if planes > 0 && planes <= 63 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument and 0 < planes <= 63, " +
        s"got ${child.dataType.catalogString}, planes=$planes")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_lsh_bucket"

  override protected def nullSafeEval(qv: Any): Any =
    LshBucketExpr.bucket(qv.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshBucketExpr.bucket($v, $planes);")

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {

  def bucket(qv: ArrayData, planes: Int): Long = {
    val n = qv.numElements()
    if (n == 0) return 0L // HOF twin: empty zip null-pads → null dots → 0
    val acc = new Array[Long](planes)
    var hasNull = false
    var d = 0
    while (d < n && !hasNull) {
      if (qv.isNullAt(d)) hasNull = true
      else {
        val x = qv.getLong(d)
        var r = 0
        while (r < planes) {
          // coef(r, d) = ((2r+3)(d²+1) + 7919(r+1)(d+1)) mod 101 − 50,
          // exactly the hplaneDot arithmetic (Long math, % is Java rem —
          // operands are nonnegative here so it matches SQL mod)
          val coef = ((2L * r + 3) * (d.toLong * d + 1) +
            7919L * (r + 1) * (d + 1)) % 101 - 50
          acc(r) += x * coef
          r += 1
        }
      }
      d += 1
    }
    if (hasNull) return 0L // null element nulls every sign test → bucket 0
    var out = 0L
    var r = 0
    while (r < planes) {
      if (acc(r) >= 0) out |= 1L << r
      r += 1
    }
    out
  }
}
