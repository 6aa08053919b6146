package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair rows whose times are within a window of
  * each other, another operator Spark has no native support for. The
  * scalable composition is TIME BINNING: quantize each side's time into
  * `width`-sized bins, explode one side into its bin and the two
  * adjacent bins, equi-join on the bin id, then apply the exact
  * predicate. Any pair within `width` differs by at most one bin, so
  * candidates are complete; the join is a hash join on bin ids — never
  * a cartesian or a broadcast-range scan — and candidate volume is
  * bounded by (rows per bin)², locally, per bin.
  */
object RangeJoin {

  /** Pairs (a, b) with `0 < |aTime - bTime| <= width` (self-pairs on
    * `idCol` excluded, both orientations kept). `timeCol` must be a
    * numeric time (e.g. epoch micros); `width` in the same unit.
    * Column names in the output are prefixed `a_` / `b_`.
    *
    * REQUIRES `idCol` unique per row: self-pair exclusion and the
    * candidate dedup both key on it, so duplicate ids would drop valid
    * pairs between distinct rows sharing an id and collapse distinct
    * row-pairs to one arbitrary row's `carryCols`. Callers with a
    * non-unique natural id must pre-assign a surrogate
    * (e.g. `monotonically_increasing_id()`) and pass that.
    */
  def withinWindowPairs(df: DataFrame, idCol: String, timeCol: String,
      width: Long, carryCols: Seq[String]): DataFrame = {
    val cols = (idCol +: timeCol +: carryCols).distinct
    val slim = df.select(cols.map(col): _*)
    val bin = (col(timeCol) / lit(width)).cast("long")
    val a = slim.withColumn("__bin", bin)
    val b = slim.withColumn("__bin0", bin)
      .withColumn("__bin",
        explode(array(col("__bin0") - 1, col("__bin0"), col("__bin0") + 1)))
      .drop("__bin0")
    def pref(p: String, d: DataFrame): DataFrame =
      cols.foldLeft(d)((acc, c) => acc.withColumnRenamed(c, s"$p$c"))
    // exactly-once by construction: b's three exploded copies carry
    // DISTINCT bin values, so for any (a-row, b-row) at most one copy
    // equals a's single bin — and a pair within `width` differs by at
    // most one bin, so exactly one does. No dedup pass needed, which
    // saves a full shuffle over the candidate set.
    pref("a_", a).join(pref("b_", b), "__bin")
      .filter(col(s"a_$idCol") =!= col(s"b_$idCol") &&
        abs(col(s"a_$timeCol") - col(s"b_$timeCol")) <= width)
      .drop("__bin")
  }

  /** Convenience: epoch-micros column from a timestamp. */
  def micros(ts: Column): Column = unix_micros(ts)
}
