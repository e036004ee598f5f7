package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the profiling/layout pack and the round-2 dedup/text adds:
  * bloom-pruned incremental dedup is EXACT (equals the plain anti-join),
  * vocab capping preserves token order and count, the numeric profile is a
  * single-scan plan, and z-order buckets are tight in both dimensions.
  */
class ProfilingSpec extends AnyFunSuite {

  private lazy val spark = Session.builder("profiling-spec").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  /** Adversarial fixture for the histogram-substrate rewrites: 8 columns
    * shaped to hit every edge the TPC-H tables never exercise — negatives,
    * a constant column, two-valued, extreme magnitudes next to tiny ones,
    * heavy duplication, and an odd row count (interpolation lands between
    * ranks). Written as a parquet `lineitem` so the REAL prof1/prof4
    * query bodies run unmodified.
    */
  private lazy val adversarialDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("prof_prop").toString
    val rnd = new scala.util.Random(20260814L)
    val n = 1001 // odd: quantile positions interpolate
    val rows = (0 until n).map { i =>
      (i.toLong - 500L,                        // l_orderkey: negatives
       42L,                                    // l_partkey: constant
       if (i % 3 == 0) 7L else -7L,            // l_suppkey: two-valued
       rnd.nextInt(5).toLong,                  // l_linenumber: heavy dups
       BigDecimal(rnd.nextInt(2000) - 1000)    // l_quantity: decimal-ish
         .setScale(2, BigDecimal.RoundingMode.HALF_UP),
       BigDecimal(math.pow(10, rnd.nextInt(13)).toLong)
         .setScale(2, BigDecimal.RoundingMode.HALF_UP),                         // l_extendedprice: 1..1e12
       BigDecimal(rnd.nextGaussian()).setScale(2, BigDecimal.RoundingMode.HALF_UP), // l_discount
       BigDecimal(i % 2).setScale(2, BigDecimal.RoundingMode.HALF_UP))          // l_tax: two-valued
    }
    import spark.implicits._
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    tmp
  }

  test("prof4 histogram quantiles ≡ Spark percentile, bit-for-bit, " +
      "on adversarial data") {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = queries.Profiling.quantileProfile.run(spark, adversarialDir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val psSql = "array(0.01, 0.25, 0.5, 0.75, 0.99)"
    val li = Tables.load(spark, adversarialDir, "lineitem")
    for (c <- cols) {
      val exp = li.select(
        expr(s"percentile(CAST($c AS DOUBLE), $psSql)")).head().getSeq[Double](0)
      Seq(0.01, 0.25, 0.5, 0.75, 0.99).zip(exp).foreach { case (p, q) =>
        assert(got((c, p)) === q,
          s"$c p=$p: histogram ${got((c, p))} != percentile $q")
      }
    }
    assert(got.size === cols.size * 5)
  }

  test("prof1 histogram profile ≡ direct count_distinct aggregate " +
      "on adversarial data") {
    val got = queries.Profiling.numericProfile.run(spark, adversarialDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val li = Tables.load(spark, adversarialDir, "lineitem")
    for (c <- got.keys) {
      val e = li.agg(
        count(lit(1)), sum(when(col(c).isNull, 1L).otherwise(0L)),
        count_distinct(col(c)), min(col(c)).cast("double"),
        max(col(c)).cast("double")).head()
      assert(got(c) === ((e.getLong(0), Option(e.get(1)).map(_.toString.toLong)
        .getOrElse(0L), e.getLong(2), e.getDouble(3), e.getDouble(4))),
        s"$c profile mismatch")
    }
  }

  test("dd12: bloom-pruned result equals the plain hash semi-join (exact)") {
    val out = queries.Dedup.bloomIncremental.run(spark, dir)
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val plain = d.filter(col("doc_id") % 2 === 1).as("b")
      .join(d.filter(col("doc_id") % 2 === 0).select(col("h")).distinct()
        .withColumn("c", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), coalesce(col("c"), lit(false)).as("in_corpus"))
    assert(out.select("doc_id", "in_corpus").exceptAll(plain).count() === 0)
    assert(plain.exceptAll(out.select("doc_id", "in_corpus")).count() === 0)
    // and the batch side is fully covered, one row per odd doc
    assert(out.count() === d.filter(col("doc_id") % 2 === 1).count())
  }

  test("tx11: capped text preserves token order/count; unk counts add up") {
    val out = queries.Text.vocabCap.run(spark, dir)
    val orig = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextHash.tokens(col("text"))).cast("long").as("n0"))
      .filter(col("n0") > 0)
    // token count survives the rewrite (order-preserving reassembly)
    val joined = out.join(orig, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("n0")).count() === 0)
    assert(out.count() === orig.count())
    // every non-<unk> token in the capped text is one of the top-40, and
    // the <unk> count matches the rewritten text
    val recount = out.filter(
      size(filter(split(col("capped_text"), " "), t => t === "<unk>"))
        .cast("long") =!= col("n_unk"))
    assert(recount.count() === 0)
    val vocabSize = out
      .select(explode(split(col("capped_text"), " ")).as("t"))
      .filter(col("t") =!= "<unk>").distinct().count()
    assert(vocabSize <= 40)
  }

  test("prof1: single scan of lineitem (one aggregate, no self-union)") {
    val out = queries.Profiling.numericProfile.run(spark, dir)
    val plan = out.queryExecution.optimizedPlan.toString
    // one scan: exactly one leaf relation in the plan (Spark rewrites the
    // 8 exact count-distincts into a single scan + Expand, not 8 scans)
    assert("(?m)^\\s*\\+?-? ?Relation ".r.findAllIn(plan).size === 1, plan)
    assert(out.count() === 8)
    // spot-check against directly computed values
    val li = Tables.load(spark, dir, "lineitem")
    val row = out.filter(col("column_name") === "l_quantity").head()
    assert(row.getAs[Long]("n_rows") === li.count())
    assert(row.getAs[Long]("n_nulls") === li.filter(col("l_quantity").isNull).count())
    assert(row.getAs[Double]("min_value") ===
      li.agg(min(col("l_quantity")).cast("double")).head().getDouble(0))
  }

  /** The melt-envelope guard fires for real: values the DECIMAL(38,6)
    * cast nulls (|v| ≥ 10^32) poison `n_nulls` with raise_error when read,
    * instead of silently counting the overflow as a null. Also pins the
    * converse: raw nulls alone do NOT trip the guard (they're the marker
    * bucket, not a violation).
    */
  test("prof1 guard raises on out-of-envelope values, not on raw nulls") {
    val tmp = java.nio.file.Files.createTempDirectory("prof1_guard").toString
    def write(quantityExpr: String): Unit =
      spark.range(4).selectExpr(
        "id AS l_orderkey", "id AS l_partkey", "id AS l_suppkey",
        "CAST(id AS INT) AS l_linenumber", s"$quantityExpr AS l_quantity",
        "CAST(1.5 AS DOUBLE) AS l_extendedprice",
        "CAST(0.1 AS DOUBLE) AS l_discount", "CAST(0.0 AS DOUBLE) AS l_tax")
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    // out-of-envelope: one astronomically large double → cast null → raise
    write("CASE WHEN id = 0 THEN 1e33 ELSE CAST(id AS DOUBLE) END")
    val ex = intercept[Throwable] {
      queries.Profiling.numericProfile.run(spark, tmp).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("envelope violated")),
      s"expected the guard's raise_error, got: $ex")
    // raw nulls: counted, no raise
    write("CASE WHEN id = 0 THEN CAST(NULL AS DOUBLE) ELSE CAST(id AS DOUBLE) END")
    val row = queries.Profiling.numericProfile.run(spark, tmp)
      .filter(col("column_name") === "l_quantity").head()
    assert(row.getAs[Long]("n_nulls") === 1L)
    assert(row.getAs[Long]("n_rows") === 4L)
    assert(row.getAs[Long]("n_distinct") === 3L)
  }

  test("prof2: one shuffle profiles both categorical columns") {
    val out = queries.Profiling.categoricalProfile.run(spark, dir)
    assert(out.count() === 2)
    val li = Tables.load(spark, dir, "lineitem")
    val expect = li.groupBy(col("l_returnflag")).count()
      .orderBy(col("count").desc, col("l_returnflag")).head()
    val row = out.filter(col("column_name") === "l_returnflag").head()
    assert(row.getAs[String]("top_value") === expect.getString(0))
    assert(row.getAs[Long]("top_count") === expect.getLong(1))
    assert(row.getAs[Long]("n_distinct") ===
      li.select(col("l_returnflag")).distinct().count())
  }

  test("z1: buckets are tight envelopes (better than random layout)") {
    val out = queries.Profiling.zorderLayout.run(spark, dir).collect()
    assert(out.nonEmpty)
    // every bucket's z-range is disjoint (buckets are curve segments)
    val sorted = out.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_z") < b.getAs[Long]("min_z"))
      case _ => ()
    }
    // envelope area of each bucket is far below the global envelope
    // (locality: the curve keeps both dims bounded within a bucket)
    val globalY = out.map(_.getAs[Long]("max_y")).max -
      out.map(_.getAs[Long]("min_y")).min
    sorted.foreach { r =>
      val dy = r.getAs[Long]("max_y") - r.getAs[Long]("min_y")
      assert(dy * 4 <= globalY + 4,
        s"bucket ${r.getAs[Long]("bucket")} y-envelope $dy vs global $globalY")
    }
  }
}
