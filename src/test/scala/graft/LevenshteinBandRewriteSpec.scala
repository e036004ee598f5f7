package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LevenshteinBandRewrite optimizer rule: naive thresholded
  * edit-distance predicates must run the banded O(k·n) DP, with results
  * identical to the full DP, and non-threshold comparisons left alone.
  */
class LevenshteinBandRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    Session.builder("lev-rewrite-test").getOrCreate()

  private def bandedCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.expressions.map(_.collect {
      case Levenshtein(_, _, Some(_)) => 1
    }.size).sum

  test("<= k and < k predicates rewrite to the banded form; results exact") {
    import spark.implicits._
    // distinct part-name pairs from the real domain: ground truth computed
    // driver-side with the full DP over collected strings
    val names = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select($"p_name").distinct().as[String].collect().sorted.take(40)
    val pairs = names.flatMap(a => names.map(b => (a, b))).toSeq
    def fullDp(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // build the pair relation FROM the parquet scan (a literal LocalRelation
    // would be folded away by ConvertToLocalRelation before the plan
    // assertion could see the rewritten predicate)
    val nd = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select($"p_name").distinct().filter($"p_name".isin(names: _*))
    val df = nd.select($"p_name".as("a"))
      .crossJoin(nd.select($"p_name".as("b")))
    for ((pred, keep) <- Seq(
        "levenshtein(a, b) <= 2" -> ((d: Int) => d <= 2),
        "2 >= levenshtein(a, b)" -> ((d: Int) => d <= 2),
        "levenshtein(a, b) < 3" -> ((d: Int) => d < 3))) {
      val filtered = df.filter(expr(pred))
      assert(bandedCount(filtered) > 0,
        s"'$pred' was not rewritten:\n${filtered.queryExecution.optimizedPlan}")
      val got = filtered.as[(String, String)].collect().toSet
      val want = pairs.filter { case (a, b) => keep(fullDp(a, b)) }.toSet
      assert(got === want, s"'$pred' changed results")
    }
  }

  test("naive edit-distance JOIN becomes a length-blocked hash join") {
    import spark.implicits._
    val nd = Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select($"p_name").distinct()
    val joined = nd.select($"p_name".as("a"))
      .join(nd.select($"p_name".as("b")), expr("levenshtein(a, b) <= 2"))
    // LevenshteinBandRewrite bands the DP, LevenshteinJoinBlocking adds the
    // implied |len(a)-len(b)| <= 2 conjunct, BandJoinRewrite buckets it —
    // three independent rules composing to a hash join
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"edit-distance join still plans quadratic:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected a hash/merge join on the length bucket:\n$p")
    // results must equal the driver-side full-DP ground truth
    val names = nd.as[String].collect()
    def fullDp(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = names.flatMap(a => names.collect {
      case b if fullDp(a, b) <= 2 => (a, b)
    }).toSet
    assert(joined.as[(String, String)].collect().toSet === want)
  }

  test("equality and lower-bound comparisons keep the full distance") {
    import spark.implicits._
    val df = Seq(("cold bolt", "old bolt")).toDF("a", "b")
    for (pred <- Seq("levenshtein(a, b) = 2", "levenshtein(a, b) > 2",
        "levenshtein(a, b) >= 2")) {
      assert(bandedCount(df.filter(expr(pred))) === 0,
        s"'$pred' must not be banded — it needs the true distance")
    }
    // negative thresholds are left alone (the banded DP requires k >= 0)
    assert(bandedCount(df.filter(expr("levenshtein(a, b) <= -1"))) === 0)
  }
}
