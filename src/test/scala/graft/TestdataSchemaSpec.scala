package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard for the driver-generated testdata.
  *
  * Round 3 lost 32 queries and 34 tests to a silent regeneration of
  * `/root/testdata` that changed `events.ts` from parquet TIMESTAMP(NANOS) to
  * plain `timestamp[us]` — every downstream failure was a cryptic
  * DATATYPE_MISMATCH three layers away from the cause. This spec pins the
  * ENGINE-FACING dtypes (what [[Tables.load]] hands to queries, after any
  * normalization branch), so the next encoding change fails here first with a
  * message naming the loader branch to update.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = Session.get("testdata-schema-spec")

  /** table -> (column -> expected engine-facing type). Integer columns are
    * allowed to widen (int32 vs int64 both load fine) so we only pin the
    * types queries actually branch on: timestamps, doubles, strings, arrays.
    */
  private val expected: Map[String, Map[String, DataType]] = Map(
    "events" -> Map(
      // Tables.load normalizes whatever parquet encoding the generator used
      // (nanos-as-long OR timestamp[us]/NTZ) to session-UTC TimestampType.
      // If this fails, update the dataType match in Tables.load, not the
      // 30+ queries downstream.
      "ts" -> TimestampType,
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType),
    "orders" -> Map(
      "o_orderkey" -> LongType, "o_totalprice" -> DoubleType,
      "o_orderstatus" -> StringType),
    "customer" -> Map("c_custkey" -> LongType, "c_acctbal" -> DoubleType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_retailprice" -> DoubleType),
    "nation" -> Map("n_name" -> StringType),
    "region" -> Map("r_name" -> StringType)
  )

  // date-ish columns may arrive as DATE or TIMESTAMP flavors across generator
  // versions; queries only ever truncate/compare them, so any of these works.
  private val dateish = Set("l_shipdate", "o_orderdate")

  test("engine-facing dtypes of every testdata table match what queries assume") {
    val problems = Tables.names.flatMap { name =>
      val df = Tables.load(spark, sfDir, name)
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val want = expected.getOrElse(name, Map.empty)
      want.flatMap { case (col, tpe) =>
        actual.get(col) match {
          case None =>
            Some(s"$name.$col: column MISSING from testdata (generator schema change?)")
          case Some(a) if a != tpe =>
            Some(s"$name.$col: engine-facing type is $a, queries assume $tpe" +
              (if (col == "ts") " — update the dataType match in graft.Tables.load" else ""))
          case _ => None
        }
      } ++ actual.collect {
        case (col, t) if dateish(col) && !Set[DataType](DateType, TimestampType, TimestampNTZType).contains(t) =>
          s"$name.$col: date-ish column read as $t"
      }
    }
    assert(problems.isEmpty, problems.mkString("\n", "\n", "\n"))
  }
}
