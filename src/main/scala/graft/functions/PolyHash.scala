package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 31-base polynomial rolling
  * hash (mod 1e9+7) — the hot inner loop of every dedup / fingerprint /
  * multimodal-feature pipeline.
  *
  * Why a custom Expression and not built-ins: the composable formulation
  * (`aggregate(regexp_extract_all(s,'.'), ...)`) allocates a per-character
  * string array and evaluates the fold lambda interpreted — higher-order
  * functions are CodegenFallback in Spark. This expression is one tight
  * codegen'd loop over codepoints: no allocation, stays inside whole-stage
  * codegen. Semantics (and the DuckDB oracle rendering,
  * [[TextHash.sqlPolyHash]]) are unchanged: fold (acc*31 + codepoint) % Mod.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Shared scalar kernel (also used by the multimodal decode stub so the
    * kernel and expression paths are the same math by construction).
    */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31 + cp) % Mod
    }
    acc
  }
}
