package graft

import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-driven invariants for the round-2 primitives: audio chunk tiling,
  * PQ code bounds, and the pigeonhole exactness of the Hamming band join
  * (banded result ≡ brute force on real data).
  */
class NewOpsPropertySpec extends AnyFunSuite {

  private lazy val spark = Session.builder("newops-spec").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("audioChunks tile the payload: consecutive indexes, exact offsets") {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").as("t"))
      .filter(length(col("t")) > 0)
    val chunks = d.select(col("doc_id"), length(col("t")).as("n"),
        explode(Media.audioChunks(col("t"), 64, 48)).as("c"))
      .select(col("doc_id"), col("n"), col("c.*"))
    // offsets advance by the step; every chunk starts inside the payload;
    // lengths are full except possibly truncated at the tail
    val bad = chunks.filter(
      col("start_off") =!= col("chunk_index") * 48 ||
        col("start_off") >= col("n") ||
        col("chunk_len") =!= least(lit(64), col("n") - col("start_off")))
    assert(bad.count() === 0)
    // chunk count per doc = ceil(n / 48) (every start < n is emitted)
    val counts = chunks.groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("k"))
      .filter(col("k") =!= ceil(col("n").cast("double") / 48).cast("long"))
    assert(counts.count() === 0)
  }

  test("PQ codes: m codes per vector, every code a live codebook cell") {
    import graft.functions.{PqIndex, TextHash}
    val q = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), TextHash.quantize(col("embedding")).as("qv"))
    val (codebook, codes) = PqIndex.fitEncode(spark, q, m = 4, subDim = 16,
      ks = 8, iters = 1)
    val n = q.count()
    assert(codes.count() === n)
    assert(codes.filter(size(col("codes")) =!= 4).count() === 0)
    // every emitted (sub, code) exists in the codebook
    val used = codes.select(posexplode(col("codes")).as(Seq("sub", "cell")))
      .distinct()
    val dead = used.join(codebook, Seq("sub", "cell"), "left_anti")
    assert(dead.count() === 0)
  }

  test("Hamming band join finds EXACTLY the brute-force pair set (dd10)") {
    import graft.functions.TextHash._
    val sims = Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      simhash32(transform(tokens(col("text")), t => polyHash(t))).as("simhash"))
      .persist()
    val brute = sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 3)
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = sims.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*))
        .as(Seq("band", "band_val")))
    val banded = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty) // the corpus actually exercises the check
    assert(banded === brute)
  }

  test("dd6 bucketed pairs score identically to the brute-force oracle") {
    // dd6's pair source is the 8-plane sign-bucket join; every pair it
    // emits must exist in the exact all-pairs scoring with the SAME cosine
    // (the bucket join may only SELECT pairs, never alter their score).
    val brute = graft.queries.Dedup.cosinePairsBrute(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = SparkEntry.queries("dd6_embedding_cosine_pairs")(spark, dir)
      .select(col("vec_a"), col("vec_b"), col("cosine")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key), s"pair $key not in exact all-pairs set")
      assert(brute(key) === r.getDouble(2), s"score drift on $key")
    }
    // candidate recall on genuinely-near pairs: every brute pair at
    // cosine >= 0.9 must be co-bucketed (identical vectors share every
    // sign, and near-identical ones agree on each plane w.p. ~0.9+; on
    // this fixed corpus a miss means the bucket rule broke, not bad luck)
    val near = brute.filter(_._2 >= 0.9).keySet
    if (near.nonEmpty) {
      import graft.functions.TextHash._
      val b = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), lshBucket(quantize(col("embedding")), 8).as("bk"))
      val coBucketed = b.as("a").join(b.as("b"),
          col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(near.subsetOf(coBucketed),
        s"missed near-dup pairs: ${near.diff(coBucketed)}")
    }
  }
}
