package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located joins — the storage-layout half of the 100 TB
  * join story: both fact tables written `bucketBy` the join key with the
  * same bucket count join WITHOUT any exchange (no shuffle of either side at
  * read time; the shuffle was paid once at write time and amortizes over
  * every subsequent join).
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("bucket-test").getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("same-bucket-count tables join with zero Exchange") {
    import spark.implicits._
    spark.sql(
      "CREATE DATABASE IF NOT EXISTS graft_bucket LOCATION '/tmp/graft_bucket_db'")
    try {
      val li = Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val ord = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("graft_bucket.li_b")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("graft_bucket.ord_b")
      // merge hint: rule out a broadcast so the test proves CO-LOCATION
      // (sort-merge join reading bucket files directly, no exchange)
      val j = spark.table("graft_bucket.li_b").hint("merge")
        .join(spark.table("graft_bucket.ord_b"),
          $"l_orderkey" === $"o_orderkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // same result as the plain (shuffling) join on the raw parquet
      val plain = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          $"l_orderkey" === $"o_orderkey")
      assert(j.count() === plain.count())
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bucket CASCADE")
    }
  }
}
