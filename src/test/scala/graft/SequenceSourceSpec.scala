package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 connector semantics: pushdown reaches the source,
  * pruning is visible as FEWER planned partitions (not just a plan
  * annotation), residual evaluation keeps semantics exact, and column
  * pruning narrows the produced schema.
  */
class SequenceSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def seq(start: Long, end: Long, slices: Int) =
    spark.read.format("graft.sources.SequenceSource")
      .option("start", start.toString).option("end", end.toString)
      .option("slices", slices.toString).load()

  test("id-range filter prunes slices inside the source") {
    val df = seq(0, 1000000, 32)
      .filter(col("id") >= 250000L && col("id") < 750000L)
    // slices are 31250 wide; [250000, 750000) covers exactly slices
    // 8..23 — 16 of 32 survive planning
    assert(df.rdd.getNumPartitions === 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(id,250000)"), plan.take(800))
    assert(plan.contains("LessThan(id,750000)"), plan.take(800))
    assert(df.count() === 500000L)
  }

  test("unfiltered scan plans every slice; values are the sequence") {
    val df = seq(0, 1000, 8)
    assert(df.rdd.getNumPartitions === 8)
    val agg = df.agg(count(lit(1)), sum("id"), min("id"), max("id"))
      .collect()(0)
    assert(agg.getLong(0) === 1000L)
    assert(agg.getLong(1) === 499500L)
    assert(agg.getLong(2) === 0L)
    assert(agg.getLong(3) === 999L)
  }

  test("equality pushdown degenerates to a single one-row slice") {
    val df = seq(0, 1000000, 32).filter(col("id") === 444444L)
    assert(df.rdd.getNumPartitions === 1)
    val r = df.collect()
    assert(r.length === 1)
    assert(r(0).getLong(0) === 444444L)
    assert(r(0).getInt(1) === (444444L % 97).toInt)
  }

  test("column pruning: projecting bucket alone still computes it") {
    val r = seq(0, 97 * 3, 4).select("bucket")
      .groupBy("bucket").count().collect()
    assert(r.length === 97)
    assert(r.forall(_.getLong(1) === 3L))
  }
}
