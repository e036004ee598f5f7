package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the engine's native expressions: registers every custom
  * codegen'd Catalyst expression as a session SQL function (via
  * `SparkSessionExtensions.injectFunction`), so plain `spark.sql` queries —
  * not just the Scala Column API — can use the dedup/similarity kernels:
  *
  * {{{
  *   SELECT doc_id, graft_poly_hash(text)            FROM documents
  *   SELECT graft_minhash_sig(hs, 16)                 -- k literal
  *   SELECT graft_simhash32(hs)
  *   SELECT graft_dot_q(qa, qb), graft_dot_q_multi(qv, batch)
  *   SELECT graft_lsh_bucket(qv, 8)                   -- planes literal
  * }}}
  *
  * Static parameters (`k`, `planes`) must be integer literals — they are
  * baked into the generated code, exactly like the Column API's Scala
  * arguments.
  */
object GraftFunctions {

  private def one(name: String, args: Seq[Expression]): Expression = {
    require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
    args.head
  }

  private def litInt(name: String, e: Expression, what: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$name: $what must be an INT literal, got $other")
  }

  val extension: SparkSessionExtensions => Unit = { ext =>
    ext.injectFunction((FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (args: Seq[Expression]) => PolyHash(one("graft_poly_hash", args))))

    ext.injectFunction((FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (args: Seq[Expression]) => SimHash32(one("graft_simhash32", args))))

    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_minhash_sig expects (hashes, k), got ${args.length} args")
        MinHashSig(args.head, litInt("graft_minhash_sig", args(1), "k"))
      }))

    ext.injectFunction((FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "graft_dot_q"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_dot_q expects (a, b), got ${args.length} args")
        DotQ(args.head, args(1))
      }))

    ext.injectFunction((FunctionIdentifier("graft_dot_q_multi"),
      new ExpressionInfo(classOf[DotQMulti].getName, "graft_dot_q_multi"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_dot_q_multi expects (vec, batch), got ${args.length} args")
        DotQMulti(args.head, args(1))
      }))

    ext.injectFunction((FunctionIdentifier("graft_minhash_merge"),
      new ExpressionInfo(classOf[MinHashMerge].getName, "graft_minhash_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_minhash_merge expects (sig, k), got ${args.length} args")
        MinHashMerge(args.head, litInt("graft_minhash_merge", args(1), "k"))
          .toAggregateExpression()
      }))

    ext.injectFunction((FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "graft_lsh_bucket"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"graft_lsh_bucket expects (qv, planes), got ${args.length} args")
        LshBucketExpr(args.head, litInt("graft_lsh_bucket", args(1), "planes"))
      }))
  }
}
