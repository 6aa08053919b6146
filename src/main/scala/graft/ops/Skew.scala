package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join splitting handles join-side skew at runtime; for
  * AGGREGATIONS over pathologically hot keys (one key = 30% of 100 TB),
  * pre-shuffle salting keeps every reducer bounded: phase 1 aggregates
  * on (key, salt) — map-side partials spread the hot key over `salts`
  * reducers — phase 2 re-aggregates partials on the key alone. Works
  * for any algebraic aggregate (sum/count/min/max); the phase-2 combine
  * of each is declared by the caller.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): derived from a hash of
    * the whole row, so it needs no id column and stays stable across
    * retries (rand() would break speculative-execution determinism).
    */
  private def salt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong))

  /** Salted `groupBy(key).agg(sum(value))`. */
  def saltedSum(df: DataFrame, key: String, value: String,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$value"))

  /** Salted `groupBy(key).count()`. */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /** Skew-safe exact distinct-count, two-phase: phase 1 dedups
    * (key, value) — the shuffle key INCLUDES the value, so a hot key's
    * rows already spread across reducers by value hash (no salt needed;
    * a salt derived from the dedup key itself would be a no-op), with
    * map-side partial dedup bounding shuffle volume — phase 2 counts per
    * key, where `count` is algebraic and partial-aggregates map-side.
    */
  def twoPhaseCountDistinct(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value))
      .dropDuplicates(key, value)
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"distinct_$value"))
}
