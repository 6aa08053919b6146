package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

/** Bucketed co-located join: same-bucketed tables join with no shuffle
  * exchange on either side — the write-once-shuffle-never layout for
  * keys joined daily at scale.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("same-bucketed tables sort-merge join with zero exchanges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("buckets").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "orders_b", s"$dir/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", s"$dir/lineitem", "o_orderkey", 8)

    // force the join path (tiny tables would broadcast otherwise)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.coLocatedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // and it still computes the right thing
      val cnt = joined.count()
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(cnt === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
