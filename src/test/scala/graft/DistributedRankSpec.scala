package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DistributedRank

/** DistributedRank must be BIT-IDENTICAL to the window spelling it
  * replaces — rfm_segments / concentration / bucketize_depth keep
  * their oracles on that claim. Random data with planted ties,
  * negatives, and fractional values; ntile checked at n < k, n = k,
  * and n % k ≠ 0.
  */
class DistributedRankSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("withRowNumber equals row_number over (value, tie) on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // heavy ties (values drawn from 40 buckets), negatives, fractions,
    // and values straddling the coarse-bucket width
    val rows = (1L to 500L).map { id =>
      (id, math.floor(rnd.nextDouble() * 40 - 20) * 517.25)
    }
    val df = rows.toDF("id", "v")
    val got = DistributedRank
      .withRowNumber(df, col("v"), col("id"), "rn", width = 1024.0)
      .select(col("id"), col("rn")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = df.select(col("id"),
        row_number().over(Window.orderBy(col("v"), col("id")))
          .cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("ntileOf equals ntile(k) for awkward n (n < k, n = k, n % k != 0)") {
    import spark.implicits._
    for (n <- Seq(1, 3, 5, 7, 50, 503); k <- Seq(4, 5, 10)) {
      val df = (1L to n.toLong).toDF("id")
      val w = Window.orderBy("id")
      val both = df.select(col("id"),
        ntile(k).over(w).as("want"),
        DistributedRank.ntileOf(
          row_number().over(w).cast("long"), lit(n.toLong), k).as("got"))
      val bad = both.filter(col("want") =!= col("got")).count()
      assert(bad === 0L, s"ntile mismatch at n=$n k=$k")
    }
  }
}
