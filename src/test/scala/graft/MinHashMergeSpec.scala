package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MinHashMerge sketch aggregate: equals the relational per-index
  * group-min, is invariant under repartitioning (mergeable state), and
  * min-merging two documents' signatures equals signing their POOLED
  * shingle set (the union property that makes the sketch meaningful).
  */
class MinHashMergeSpec extends AnyFunSuite {

  private lazy val spark = Session.builder("mhm-spec").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def sigs = {
    import TextHash._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), shingles3(col("toks")).as("sh"))
      .select(col("doc_id"), col("source"),
        transform(col("sh"), x => polyHash(x)).as("hs"))
      .select(col("doc_id"), col("source"), minhashSig(col("hs"), 16).as("sig"))
  }

  test("aggregate == relational per-index group-min; repartition-invariant") {
    val viaAgg = sigs.groupBy(col("source"))
      .agg(TextHash.minhashMerge(col("sig"), 16).as("sk"))
    val viaExplode = sigs
      .select(col("source"), posexplode(col("sig")).as(Seq("i", "v")))
      .groupBy(col("source"), col("i")).agg(min(col("v")).as("mv"))
      .groupBy(col("source"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mv")))),
        x => x("mv")).as("sk"))
    assert(viaAgg.exceptAll(viaExplode).count() === 0)
    assert(viaExplode.exceptAll(viaAgg).count() === 0)
    // mergeability: any physical partitioning produces the same sketch
    val shuffled = sigs.repartition(17, col("doc_id")).groupBy(col("source"))
      .agg(TextHash.minhashMerge(col("sig"), 16).as("sk"))
    assert(viaAgg.exceptAll(shuffled).count() === 0)
  }

  test("union property: merged signatures == signature of pooled shingles") {
    import TextHash._
    import spark.implicits._
    val two = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "a quick brown fox ran over the lazy dog yesterday evening"))
      .toDF("doc_id", "text")
    val sig = two
      .select(col("doc_id"), shingles3(tokens(col("text"))).as("sh"))
      .select(col("doc_id"), transform(col("sh"), x => polyHash(x)).as("hs"))
      .select(col("doc_id"), minhashSig(col("hs"), 16).as("sig"))
    val merged = sig.agg(minhashMerge(col("sig"), 16).as("sk"))
      .head().getSeq[Long](0)
    // pooled signature computed directly: union shingles -> hashes -> sig
    val union = two
      .select(explode(shingles3(tokens(col("text")))).as("s")).distinct()
      .select(collect_list(polyHash(col("s"))).as("hs"))
      .select(minhashSig(col("hs"), 16).as("sig"))
      .head().getSeq[Long](0)
    assert(merged === union)
  }

  test("SQL surface: graft_minhash_merge aggregates through spark.sql") {
    sigs.createOrReplaceTempView("mhm_sigs")
    val viaSql = spark.sql("""
      SELECT source, graft_minhash_merge(sig, 16) AS sk
      FROM mhm_sigs GROUP BY source""")
    val viaCol = sigs.groupBy(col("source"))
      .agg(TextHash.minhashMerge(col("sig"), 16).as("sk"))
    assert(viaSql.exceptAll(viaCol).count() === 0)
    assert(viaCol.exceptAll(viaSql).count() === 0)
  }
}
