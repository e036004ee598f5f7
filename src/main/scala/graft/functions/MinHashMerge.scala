package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash-UNION sketch aggregate: element-wise minimum of per-row MinHash
  * signatures over a group — a custom `TypedImperativeAggregate`, the
  * Catalyst extension tier for aggregation state (scalar `Expression`s,
  * logical nodes, rules and strategies are covered elsewhere in this repo).
  *
  * Semantics: min-merging signatures of sets A and B yields EXACTLY the
  * signature of A ∪ B (each permutation's min over the union is the min of
  * the per-set minima) — so the group sketch equals the signature that
  * dd3's per-document kernel would compute over the group's pooled shingle
  * set, without ever materializing it.
  *
  * Scale properties that make it a real sketch:
  *   - constant state: k longs (k=16 → 128 bytes) per group, regardless of
  *     group size;
  *   - mergeable: `merge` is the same element-wise min — partial aggregation
  *     (map-side combine) and AQE re-partitioning are exact, and the result
  *     is identical under ANY partitioning (min is associative/commutative);
  *   - deterministic: pure integer math ⇒ oracle-checkable (the DuckDB twin
  *     recomputes per-index group minima).
  *
  * Null handling: null signatures are skipped; a signature of wrong length
  * is rejected at update (corrupt input fails loudly rather than silently
  * skewing the sketch). Empty group → all-sentinel (Mod) signature, the
  * same convention as the empty-document signature.
  */
case class MinHashMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input and k > 0, got " +
        s"${child.dataType.catalogString}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_merge"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(TextHash.Mod)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == k,
        s"$prettyName: signature length ${arr.numElements()} != k=$k")
      var i = 0
      while (i < k) {
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          if (x < buf(i)) buf(i) = x
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashMerge =
    copy(child = newChild)
}
