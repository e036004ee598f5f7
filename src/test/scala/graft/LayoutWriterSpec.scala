package graft

import java.nio.file.Files

import graft.sinks.LayoutWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The z-ordered writer produces files that are tight in BOTH layout
  * dimensions — the property that makes parquet min/max stats prune
  * multi-dimensional predicates — while a single-dimension sort layout is
  * tight in one dimension only.
  */
class LayoutWriterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("layout-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("z-ordered files bound both dimensions; 1-D sort bounds only one") {
    // pre-scale the narrow user_id domain (0..14 at this SF) into the
    // curve's 16-bit range — the quantile/rank prescale any real z-order
    // writer applies so every dimension contributes high curve bits
    val e = Tables.load(spark, dir, "events")
      .select(
        pmod(col("user_id") * lit(4369L), lit(65536L)).as("x"),
        pmod(expr("unix_millis(ts) div 1000"), lit(65536L)).as("y"))
    // 32 range cuts fix ~5 top curve bits ⇒ ~2 bits per dimension per
    // file (envelope ≈ 1/4 of each domain); 8 files would fix only ~1.5
    // x-bits and the mean x-envelope would sit at ~0.6 of the domain
    val nFiles = 32
    val out = Files.createTempDirectory("zorder").toString

    LayoutWriter.writeZOrdered(e, col("x"), col("y"), nFiles, out)

    def fileEnvelopes(path: String) = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(
        (max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"),
        count(lit(1)).as("n"))
      .collect()

    val zFiles = fileEnvelopes(out)
    assert(zFiles.length === nFiles)
    // same row count in, same out
    assert(zFiles.map(_.getAs[Long]("n")).sum === e.count())

    val globalDx = e.agg(max(col("x")) - min(col("x"))).head().getLong(0)
    val globalDy = e.agg(max(col("y")) - min(col("y"))).head().getLong(0)
    // pruning power is the EXPECTED per-file envelope (what a random
    // predicate's stats-pruning sees). Unaligned range cuts make a single
    // file's worst case ~3/4 of a domain, but the mean must be well under
    // half of it in BOTH dims for the curve to prune anything.
    def meanOf(rows: Array[org.apache.spark.sql.Row], c: String): Double =
      rows.map(_.getAs[Long](c)).sum.toDouble / rows.length
    assert(meanOf(zFiles, "dx") * 2 <= globalDx,
      s"mean x-envelope ${meanOf(zFiles, "dx")} vs global $globalDx")
    assert(meanOf(zFiles, "dy") * 2 <= globalDy,
      s"mean y-envelope ${meanOf(zFiles, "dy")} vs global $globalDy")

    // contrast: a 1-D sort on y is tight in y but NOT in x — its mean
    // x-envelope stays near the full domain, far above the z layout's
    val out1d = Files.createTempDirectory("sort1d").toString
    e.repartitionByRange(nFiles, col("y")).sortWithinPartitions(col("y"))
      .write.mode("overwrite").parquet(out1d)
    val sFiles = fileEnvelopes(out1d)
    assert(meanOf(sFiles, "dx") * 2 > globalDx)
    assert(meanOf(zFiles, "dx") < meanOf(sFiles, "dx"))
  }
}
