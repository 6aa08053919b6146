package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics

/** Hand-computable checks for the analytics batch's tricky pieces: the
  * Morton interleave expression and the strict-order funnel fold. The
  * value-level gate for every query is the DuckDB oracle; these pin the
  * local semantics a refactor could silently change.
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("interleave16Sql: hand-computed Morton codes") {
    import spark.implicits._
    // z(x,y) puts x's bit i at 2i and y's bit i at 2i+1
    // z(3,5): x=011 -> bits 0,2; y=101 -> bits 1,5 => 1+4+2+32 = 39
    val df = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .selectExpr(s"${Analytics.interleave16Sql("x", "y")} AS z")
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 39L, 4294967295L))
  }

  test("funnel_ordered fold: stage advances only in order and within the window") {
    import spark.implicits._
    val h = 3600000000L // 1 h in µs
    // user 1: signup -> view(+1h) -> click(+2h) -> purchase(+3h): all
    //   within the 6 h step window => stage 4
    // user 2: view BEFORE signup, nothing after => stage 1 (signup only)
    // user 3: signup -> view 10 h later (outside window) => stage 1
    // user 4: no signup at all => stage 0
    val rows = Seq(
      (1L, 0L * h, 1L, "signup"), (1L, 1L * h, 2L, "view"),
      (1L, 2L * h, 3L, "click"), (1L, 3L * h, 4L, "purchase"),
      (2L, 0L * h, 5L, "view"), (2L, 1L * h, 6L, "signup"),
      (3L, 0L * h, 7L, "signup"), (3L, 10L * h, 8L, "view"),
      (4L, 0L * h, 9L, "click"))
    val dir = java.nio.file.Files.createTempDirectory("funnel_ordered").toString
    rows.toDF("user_id", "ts_us", "event_id", "event_type")
      .select(col("user_id"), col("event_id"), col("event_type"),
        // events.parquet carries ns-precision stamps read as Long nanos
        (col("ts_us") * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("funnel_ordered")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(0 -> 1L, 1 -> 2L, 4 -> 1L))
  }
}
