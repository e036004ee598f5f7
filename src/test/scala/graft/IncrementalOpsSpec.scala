package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-4 additions beyond the oracle gate: the cdc6
  * partial-merge law, samp6's weighted-sampling bias, w20's PMI count
  * consistency, and er5's agreement with the er1 candidate generator.
  */
class IncrementalOpsSpec extends AnyFunSuite {

  private lazy val spark = Session.builder("incr-spec").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("cdc6: merged partials equal the direct full aggregate exactly") {
    val merged = queries.Cdc.incrementalRollup.run(spark, dir)
    val direct = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("total_value"),
        max(col("value")).as("max_value"))
    assert(merged.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(merged).count() === 0)
    // and the cut actually splits the log (both sides non-empty)
    val ev = Tables.load(spark, dir, "events")
    assert(ev.filter(col("ts") < lit("2024-01-16 00:00:00")).count() > 0)
    assert(ev.filter(col("ts") >= lit("2024-01-16 00:00:00")).count() > 0)
  }

  test("samp6: length-weighted sample is biased long; ranks are dense") {
    val sample = queries.Sampling.weightedSample.run(spark, dir)
    val popMean = Tables.load(spark, dir, "documents")
      .filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampMean = sample.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampMean > popMean,
      s"weighting had no effect: sample mean $sampMean vs population $popMean")
    // dense distinct ranks 1..k per language
    sample.collect().groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val rks = rows.map(_.getInt(1)).sorted
      assert(rks.toSeq == (1 to rks.length).toSeq, s"ranks not dense: $lang")
    }
  }

  test("w20: PMI counts are consistent and the formula recomputes") {
    val pmi = queries.Windows.pmiCooccurrence.run(spark, dir).collect()
    assert(pmi.nonEmpty)
    pmi.foreach { r =>
      val (nAb, nA, nB, nS) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nAb <= math.min(nA, nB))
      assert(math.max(nA, nB) <= nS)
      val expect = math.log(nAb.toDouble * nS / (nA.toDouble * nB))
      assert(math.abs(r.getDouble(6) - expect) < 1e-12)
    }
  }

  test("g4: census matches an in-memory brute-force triangle count") {
    val census = queries.Graph.triangleCensus.run(spark, dir).head
    // reference: rebuild the tie graph naively and count triangles
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { order =>
      val ps = order.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).iterator // iterator: Map.collect over tuple results
      .collect { case (e, dups) if dups.size >= 2 => e }.toSet // would rebuild a Map keyed by u and collapse edges
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val wantTri = edges.toSeq.map { case (u, v) =>
      (adj.getOrElse(u, Set.empty) & adj.getOrElse(v, Set.empty)).size
    }.sum
    assert(census.getAs[Long]("n_edges") === edges.size.toLong)
    assert(census.getAs[Long]("n_triangles") === wantTri.toLong)
    val degs = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).values.map(_.size.toLong)
    assert(census.getAs[Long]("n_wedges") === degs.map(d => d * (d - 1) / 2).sum)
  }

  test("dq3: reconciliation census is internally consistent") {
    val r = queries.Quality.reconciliation.run(spark, dir).head
    val nOrders = Tables.load(spark, dir, "orders").count()
    assert(r.getAs[Long]("n_orders") === nOrders)
    assert(r.getAs[Long]("n_within_1pct") <= r.getAs[Long]("n_within_10pct"))
    assert(r.getAs[Long]("n_within_10pct") <= nOrders)
    assert(r.getAs[Long]("n_orphaned") ===
      Tables.load(spark, dir, "orders").join(
        Tables.load(spark, dir, "lineitem").select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count())
    assert(r.getAs[Double]("max_rel_drift") >= 0.0)
  }

  test("er5: blocking audit agrees with the er1 candidate generator") {
    val audit = queries.EntityResolution.blockingQuality.run(spark, dir).head
    val er1Count = queries.EntityResolution.candidatePairs.run(spark, dir)
      .count()
    assert(audit.getLong(3) === er1Count) // n_candidates_true = er1 pairs
    val pc = audit.getDouble(4)
    assert(pc > 0.0 && pc <= 1.0)
    assert(audit.getDouble(5) > 0.8, "blocking prunes most of the pair space")
  }
}
