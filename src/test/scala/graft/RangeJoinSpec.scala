package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Binned range join: boundary inclusion, bin-straddling pairs, self
  * exclusion, and no duplicate pairs from adjacent candidate bins.
  */
class RangeJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("equals the brute-force pair definition on random data (fixed seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 120).map(i => (i.toLong, rnd.nextInt(5000).toLong, "k"))
    val df = rows.toDF("id", "t", "kind")
    val got = RangeJoin.withinWindowPairs(df, "id", "t", 100L, Seq("kind"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- rows; b <- rows
      if a._1 != b._1 && math.abs(a._2 - b._2) <= 100L
    } yield (a._1, b._1)).toSet
    assert(got === expected)
  }

  test("pairs within the window survive, boundaries inclusive, no dupes") {
    import spark.implicits._
    // width 100: (1,2) 60 apart straddling a bin edge; (1,3) exactly 100
    // (inclusive); (3,4) 250 apart (out); 5 isolated
    val df = Seq(
      (1L, 70L, "x"), (2L, 130L, "y"), (3L, 170L, "x"),
      (4L, 420L, "z"), (5L, 1000L, "x")
    ).toDF("id", "t", "kind")
    val pairs = RangeJoin.withinWindowPairs(df, "id", "t", 100L, Seq("kind"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L)))
  }
}
