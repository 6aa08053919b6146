package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row at
  * or before the left row's time, per key. Spark has no native as-of
  * operator; the scalable composition is NOT the naive
  * `left.join(right, key && rTime <= lTime)` + max-per-row (a range
  * join whose candidate count explodes quadratically on hot keys) but a
  * tagged UNION + one window pass: sort each key's merged timeline once
  * and carry the latest right payload forward with
  * `last(_, ignoreNulls)`. One shuffle, O(n log n) per key, skew
  * handled the same way any window over a hot key is.
  */
object AsofJoin {

  /** `left` joined as-of against `right` on equal `key` with
    * `right(rightTime) <= left(leftTime)`; each `rightValues` column
    * appears in the output as `asof_<name>` (null when no right row
    * precedes). `leftTime`/`rightTime` must be mutually comparable.
    *
    * CONTRACT: every `rightValues` column must be of an ORDERABLE type
    * (atomic, array, or struct-of-orderables — not map). The payload
    * struct participates in the window ORDER BY to pin the tie rule
    * for right rows sharing (key, time) — see below — so an
    * unorderable value column fails analysis up front. Payloads with
    * wide string members also ride the sort key; if ties are known
    * impossible (unique (key, rightTime)), project such columns to a
    * compact surrogate and re-join them after the as-of.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the tagged-union plumbing reserves these names; a silent collision
    // would corrupt the window fill, so fail loudly up front
    val reserved = Set("__t", "__tag", "__asof") ++ rightValues.map(v => s"__rv_$v")
    val clashes = (left.columns ++ right.columns).filter(reserved).distinct
    require(clashes.isEmpty,
      s"asofJoin reserves column names ${clashes.mkString(", ")}; rename them in the inputs")
    // the OUTPUT namespace too: each rightValues column lands as asof_<v>
    // next to every left column, so a left asof_<v> would duplicate it
    val outClashes = left.columns.toSet
      .intersect(rightValues.map(v => s"asof_$v").toSet)
    require(outClashes.isEmpty,
      s"asofJoin emits ${outClashes.mkString(", ")}; rename the left column(s)")
    // right rows sort BEFORE left rows at equal time (tag 0 < 1), which
    // is what makes the bound inclusive (<=)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val lPadded = rightValues.foldLeft(l)((df, v) =>
      df.withColumn(s"__rv_$v", lit(null).cast(right.schema(v).dataType)))
    val r0 = right
      .select((col(key) +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
        rightValues.map(v => col(v).as(s"__rv_$v"))): _*)
    val rPadded = leftCols.filterNot(_ == key).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val merged = lPadded.unionByName(rPadded)
    // ONE atomic payload struct per right row: last(ignoreNulls) over
    // the struct picks the most recent right ROW even when some of its
    // members are null — filling each value column independently would
    // stitch members from DIFFERENT right rows (and make "no preceding
    // row" indistinguishable from "preceding row with a null value")
    val payload = when(col("__tag") === 0,
      struct(rightValues.map(v => col(s"__rv_$v")): _*))
    // payload as the FINAL sort key pins the tie rule: several right
    // rows sharing (key, time) would otherwise surface an arbitrary
    // one (order-nondeterministic across runs and engines); ascending
    // struct order makes last() carry the GREATEST (rightValues...)
    // tuple — a documented total order (Spark struct comparison is
    // field-by-field, nulls smallest). Left rows all carry a null
    // payload, so their relative order is untouched.
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__tag"), payload.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = merged
      .withColumn("__asof", last(payload, ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 1)
      .select((leftCols.map(col) ++
        rightValues.map(v => col("__asof").getField(s"__rv_$v").as(s"asof_$v"))): _*)
  }

  /** FORWARD as-of: for each left row, the single EARLIEST right row at
    * or after the left row's time, per key — "next maintenance after
    * the failure", "next purchase after the view". Same tagged-union +
    * one-window composition, with the timeline walked in DESCENDING
    * time (right rows still sort first at equal time, keeping the bound
    * inclusive), so the carried payload is the nearest FUTURE right
    * row. Identical cost and skew posture to the backward join.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValues: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("__t", "__tag", "__asof") ++ rightValues.map(v => s"__rv_$v")
    val clashes = (left.columns ++ right.columns).filter(reserved).distinct
    require(clashes.isEmpty,
      s"asofJoinForward reserves column names ${clashes.mkString(", ")}; rename them in the inputs")
    val outClashes = left.columns.toSet
      .intersect(rightValues.map(v => s"asof_$v").toSet)
    require(outClashes.isEmpty,
      s"asofJoinForward emits ${outClashes.mkString(", ")}; rename the left column(s)")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val lPadded = rightValues.foldLeft(l)((df, v) =>
      df.withColumn(s"__rv_$v", lit(null).cast(right.schema(v).dataType)))
    val r0 = right
      .select((col(key) +: col(rightTime).as("__t") +: lit(0).as("__tag") +:
        rightValues.map(v => col(v).as(s"__rv_$v"))): _*)
    val rPadded = leftCols.filterNot(_ == key).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val merged = lPadded.unionByName(rPadded)
    val payload = when(col("__tag") === 0,
      struct(rightValues.map(v => col(s"__rv_$v")): _*))
    // descending time; tag 0 first at equal __t keeps <= right rows
    // (now "at or after") visible to the left row. payload as the
    // final key = the same deterministic tie rule as the backward
    // variant: equal (key, time) right rows resolve to the GREATEST
    // (rightValues...) tuple instead of an arbitrary pick.
    val w = Window.partitionBy(key)
      .orderBy(col("__t").desc, col("__tag"), payload.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = merged
      .withColumn("__asof", last(payload, ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 1)
      .select((leftCols.map(col) ++
        rightValues.map(v => col("__asof").getField(s"__rv_$v").as(s"asof_$v"))): _*)
  }
}
