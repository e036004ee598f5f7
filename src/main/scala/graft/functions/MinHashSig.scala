package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the k-permutation MinHash signature
  * (Broder '97 minwise scheme, sig_j = min over shingles s of
  * ((2j+1)·s + 7919·(j+1)) mod 1e9+7) — the per-document kernel of every
  * MinHash query (dd3/dd4/dd7/dd8/pipe1).
  *
  * Why a custom Expression: the composable form — a fold keeping an
  * element-wise-min accumulator
  * (`aggregate(hs, array_repeat(Mod,k), zip_with(least...))`) — runs three
  * nested interpreted lambdas (HOFs are CodegenFallback) and allocates two
  * k-arrays per SHINGLE. This is one tight k×n loop over the input buffer
  * with a single output allocation per row.
  *
  * Semantics mirror the HOF formulation exactly (asserted in
  * MinHashSigSpec): empty input → all-sentinel (Mod) signature; null
  * elements are skipped (`least` ignores the null permuted value); null
  * input → null.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument and k > 0, got " +
        s"${child.dataType.catalogString}, k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(hs: Any): Any =
    MinHashSig.sig(hs.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.MinHashSig.sig($h, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Shared scalar kernel: one pass over the shingle hashes, k running
    * minima. All intermediates < 2⁶³ (|s| < Mod ⇒ (2k−1)·s + 7919·k ≪ 2⁶³).
    */
  def sig(hs: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, TextHash.Mod)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val s = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1) * s + 7919L * (j + 1)) % TextHash.Mod
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
