package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key never shuffle again.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle; two
  * tables bucketed (and sorted) on the join key with the same bucket
  * count join with ZERO exchanges — each task zips bucket i with bucket
  * i. This is the batch analogue of co-partitioned state, and the right
  * layout for tables joined on the same key daily (orders⋈lineitem,
  * events⋈users).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table at `path`.
    * Repartitioned BY THE BUCKET KEY first: without it every write task
    * emits its own file per bucket (tasks × buckets small files at
    * scale), and Spark won't trust per-bucket ordering split across
    * files, so downstream joins re-sort and the write-time sortBy buys
    * nothing. One shuffle here is the price of zero shuffles on every
    * later join.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner emits
    * a SortMergeJoin with no ShuffleExchange on either side (assert it
    * with `queryExecution.executedPlan`).
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
