package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsofJoin

/** As-of join semantics on hand-built rows: inclusive bound, latest
  * prior wins, null when nothing precedes, keys don't leak.
  */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("picks the latest right row at or before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after both quotes of key 10
      (2L, 10L, ts("2024-01-01 08:30:00")), // between the two
      (3L, 10L, ts("2024-01-01 08:00:00")), // EXACTLY at first quote (inclusive)
      (4L, 10L, ts("2024-01-01 07:00:00")), // before any -> null
      (5L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 1.0),
      (10L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("k", "rt", "price")

    val out = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> Some(2.0), 2L -> Some(1.0), 3L -> Some(1.0),
      4L -> None, 5L -> None))
  }

  test("equals the brute-force as-of definition on random data (fixed seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 80).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)).toSeq
    // unique right times per key so the expected match is unambiguous
    val right = rnd.shuffle((0 until 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(12).map(t =>
        (k.toLong, t.toLong, rnd.nextDouble())))).toSeq
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "rt", "price")

    val got = AsofJoin.asofJoin(l, r, "k", "t", "rt", Seq("price"))
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap

    val byKey = right.groupBy(_._1)
    val expected = left.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got === expected)
  }

  test("a null value in the matched right row stays null (no stitching from older rows)") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), Some(5.0)),
      (10L, ts("2024-01-01 09:00:00"), Option.empty[Double]) // latest, null value
    ).toDF("k", "rt", "price")
    val row = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("rt", "price"))
      .collect().head
    // the matched ROW is the 09:00 one — its null price must surface,
    // not the 08:00 row's 5.0
    assert(row.getTimestamp(3).toString === "2024-01-01 09:00:00.0")
    assert(row.isNullAt(4))
  }

  test("forward variant picks the earliest right row at or after, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 07:00:00")), // before both quotes -> first
      (2L, 10L, ts("2024-01-01 08:30:00")), // between -> second
      (3L, 10L, ts("2024-01-01 09:00:00")), // EXACTLY at second (inclusive)
      (4L, 10L, ts("2024-01-01 10:00:00")), // after all -> null
      (5L, 99L, ts("2024-01-01 12:00:00"))  // key with no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00"), 1.0),
      (10L, ts("2024-01-01 09:00:00"), 2.0)
    ).toDF("k", "rt", "price")

    val out = AsofJoin.asofJoinForward(left, right, "k", "t", "rt",
        Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0),
      4L -> None, 5L -> None))
  }

  test("forward variant equals brute-force next-at-or-after on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 80).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)).toSeq
    val right = rnd.shuffle((0 until 5).flatMap(k =>
      rnd.shuffle((0 until 1000).toList).take(12).map(t =>
        (k.toLong, t.toLong, rnd.nextDouble())))).toSeq
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("k", "rt", "price")

    val got = AsofJoin.asofJoinForward(l, r, "k", "t", "rt", Seq("price"))
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap

    val byKey = right.groupBy(_._1)
    val expected = left.map { case (id, k, t) =>
      id -> byKey.getOrElse(k, Seq.empty)
        .filter(_._2 >= t)
        .sortBy(_._2).headOption.map(_._3)
    }.toMap
    assert(got === expected)
  }
}
