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

  test("tx15 chunks reassemble to the original token stream") {
    import graft.functions.TextHash.tokens
    // rebuild chunk ARRAYS with tx15's exact expressions, then stitch:
    // every chunk contributes its first 48 tokens (the stride), the final
    // chunk contributes everything — flatten must equal the original list
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
    val chunks = d
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)), lit(48L)))
          .as("start"))
      .filter(col("start") < col("n"))
      .select(col("doc_id"), col("toks"), col("n"), col("start"),
        slice(col("toks"), (col("start") + 1L).cast("int"), lit(64)).as("chunk"))
    val stitched = chunks
      .withColumn("is_last", col("start") + 48L >= col("n"))
      .withColumn("contrib",
        when(col("is_last"), col("chunk")).otherwise(slice(col("chunk"), 1, 48)))
      .groupBy(col("doc_id"), col("toks"))
      .agg(flatten(sort_array(collect_list(struct(col("start"), col("contrib")))
        .as("cs")).getField("contrib")).as("rebuilt"))
    assert(stitched.filter(col("rebuilt") =!= col("toks")).count() === 0)
    // overlap invariant: consecutive full chunks share exactly 16 tokens
    val overlaps = chunks.filter(col("start") + 64L <= col("n"))
      .filter(col("start") + 48L < col("n"))
      .filter(size(col("chunk")) =!= 64)
    assert(overlaps.count() === 0)
  }

  test("tx14 redaction is idempotent and leaves no residual PII") {
    val emailRe = "[a-z0-9._-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "555-[0-9]{4}"
    val email = concat(lit("doc"), col("doc_id"), lit("@"),
      col("source"), lit(".example.com"))
    val phone = concat(lit("555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val planted = concat(col("text"),
      concat_ws("", array_repeat(concat(lit(" "), email),
        (col("doc_id") % 3).cast("int"))),
      concat_ws("", array_repeat(concat(lit(" "), phone),
        (col("doc_id") % 2).cast("int"))))
    val red = regexp_replace(regexp_replace(planted, emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")
    val checked = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(planted, lit(emailRe), lit(0))).as("ne"),
        size(regexp_extract_all(planted, lit(phoneRe), lit(0))).as("np"),
        size(regexp_extract_all(red, lit(emailRe), lit(0))).as("res_e"),
        size(regexp_extract_all(red, lit(phoneRe), lit(0))).as("res_p"),
        (regexp_replace(regexp_replace(red, emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]") === red).as("idempotent"))
    // detector finds exactly what was planted; redaction removes all of it
    // and a second pass is a no-op
    assert(checked.filter(col("ne") =!= (col("doc_id") % 3).cast("int") ||
      col("np") =!= (col("doc_id") % 2).cast("int")).count() === 0)
    assert(checked.filter(col("res_e") =!= 0 || col("res_p") =!= 0).count() === 0)
    assert(checked.filter(!col("idempotent")).count() === 0)
  }

  test("samp1 is deterministic and hits its per-language rates") {
    val a = SparkEntry.queries("samp1_stratified_sample")(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = SparkEntry.queries("samp1_stratified_sample")(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b) // rerun-stable: same corpus in, same sample out
    val total = Tables.load(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("samp1_stratified_sample")(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("en" -> 0.5, "fr" -> 0.5, "de" -> 0.25, "es" -> 0.25,
      "zh" -> 0.125)
    target.foreach { case (lang, rate) =>
      val n = total(lang)
      val k = kept.getOrElse(lang, 0L).toDouble
      // 4-sigma binomial envelope: a multiplicative-hash pathology would
      // blow straight through it; sampling noise will not
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(k - n * rate) <= 4 * sigma + 1,
        s"$lang: kept $k of $n at target rate $rate")
    }
  }

  test("samp4 packs: shard totals conserved, interior packs near-full") {
    val packs = SparkEntry.queries("samp4_sequence_packing")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    // per-shard token conservation vs the chunk arithmetic
    import graft.functions.TextHash.tokens
    val chunkTotals = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(tokens(col("text"))).cast("long").as("n"))
      .select(col("lang"), col("source"), col("n"),
        explode(sequence(lit(0L), greatest(col("n") - 1L, lit(0L)), lit(48L)))
          .as("start"))
      .filter(col("start") < col("n"))
      .groupBy("lang", "source")
      .agg(sum(least(lit(64L), col("n") - col("start"))).as("tot"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val packTotals = packs.groupBy(p => (p._1, p._2))
      .view.mapValues(_.map(_._4).sum).toMap
    assert(packTotals === chunkTotals)
    // greedy-start packing: every interior pack lands within one chunk of
    // the 1024 budget (the straddling chunk is counted where it starts)
    val lastPack = packs.groupBy(p => (p._1, p._2))
      .view.mapValues(_.map(_._3).max).toMap
    packs.filter(p => p._3 < lastPack((p._1, p._2))).foreach { p =>
      assert(p._4 >= 1024 - 63 && p._4 <= 1024 + 63,
        s"interior pack ${p._1}/${p._2}#${p._3} has ${p._4} tokens")
    }
  }

  test("dd18: planner volumes bracket the true candidate counts") {
    val plan = queries.Dedup.dedupPlanner.run(spark, dir).collect().head
    val (exactPairs, lshPairs) = (plan.getLong(2), plan.getLong(3))
    // the exact-path estimate counts a pair once PER SHARED SHINGLE, so it
    // upper-bounds the distinct dd2 pair count; same for LSH per shared band
    val dd2Pairs = queries.Dedup.ngramJaccard.run(spark, dir).count()
    val dd4Pairs = queries.Dedup.lshCandidates.run(spark, dir).count()
    assert(exactPairs >= dd2Pairs,
      s"exact estimate $exactPairs below true dd2 volume $dd2Pairs")
    assert(lshPairs >= dd4Pairs,
      s"LSH estimate $lshPairs below true dd4 volume $dd4Pairs")
    assert(plan.getLong(0) === 500L) // n_docs at sf0.001
    assert(lshPairs < exactPairs,
      "on this corpus LSH must reduce the candidate volume")
  }
}
