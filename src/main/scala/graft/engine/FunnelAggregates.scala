package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Schemas

/** The four aggregate families of the funnel pipeline, as Catalyst plans.
  *
  * Each mirrors one `fetch_*` / `aggregate_stages` computation of the
  * reference (`report_engine.py:89-225`) but is expressed as a single
  * declarative aggregation over however many days of data the scan produced —
  * Spark's `HashAggregateExec` does the partial (per-partition) + final
  * (post-shuffle) combine that the reference hand-rolled with per-day queries
  * and a pandas `concat(...).sum()` (`report_engine.py:119-131`). At 100 TB
  * this is the difference between N sequential scans and one distributed one.
  *
  * All inputs are string-typed frames (see [[graft.core.Schemas]]); casts
  * happen inside the aggregate expressions so they run in whole-stage codegen
  * and so empty-string / null semantics match the reference exactly
  * (sessions run non-ANSI, see [[graft.GraftSession]]: bad cells -> null,
  * skipped by SUM — the analogue of the reference's degrade-to-empty).
  */
object FunnelAggregates {

  /** Per-value `CAST(CAST(x AS DOUBLE) AS BIGINT)` — reproduces the
    * reference's `astype(float).astype(int)` truncation-toward-zero BEFORE
    * summation (`report_engine.py:225`). Cast order matters on fractional
    * inputs: trunc-then-sum != sum-then-trunc. 64-bit target: pandas
    * `astype(int)` is int64, and at 100 TB per-column sums exceed 2^31.
    */
  private def truncLong(c: Column): Column = c.cast("double").cast("long")

  /** Stage totals: one row, the 11 stage columns summed across all input rows
    * (days), each value truncated to long first (`aggregate_stages`,
    * `report_engine.py:222-225`). Missing data sums to null -> coalesce 0,
    * matching the reference's "empty frame -> entity skipped / zero" posture.
    */
  def stageTotals(stages: DataFrame): DataFrame = {
    val aggs = Schemas.stageColumns.map(c =>
      coalesce(sum(truncLong(col(c))), lit(0L)).as(c))
    stages.agg(aggs.head, aggs.tail: _*)
  }

  /** OTP totals: grand sums of the three OTP columns cast to double
    * (`fetch_otp_totals`, `report_engine.py:115-141`). Output column names
    * `Total_<col>` match the reference's SQL aliases.
    */
  def otpTotals(otp: DataFrame): DataFrame = {
    val aggs = Schemas.otpColumns.map(c =>
      sum(col(c).cast("double")).as("Total_" + c))
    otp.agg(aggs.head, aggs.tail: _*)
  }

  /** Discovery totals: grand sums with `NULLIF(x,'')` before the cast —
    * empty strings are skipped by SUM, exactly as in the reference's Drill
    * SQL (`fetch_discovery_totals`, `report_engine.py:145-171`).
    */
  def discoveryTotals(discovery: DataFrame): DataFrame = {
    val aggs = Schemas.discoveryColumns.map(c =>
      sum(nullif(col(c), lit("")).cast("double")).as(c))
    discovery.agg(aggs.head, aggs.tail: _*)
  }

  /** FI status counts over the per-user fact table: keep only the three known
    * statuses, drop null/empty, group + count (`fetch_fi_status_counts`,
    * `report_engine.py:175-199`). One shuffle on `fetch_status` (3 groups);
    * map-side partial aggregation makes this scale linearly with input.
    * The `isNotNull && =!= ""` terms are subsumed by `isin` but kept for
    * line-for-line parity with the reference's WHERE clause.
    */
  def fiStatusCounts(userFunnel: DataFrame): DataFrame =
    userFunnel
      .filter(
        col("fetch_status").isin(Schemas.fetchStatuses: _*) &&
          col("fetch_status").isNotNull && col("fetch_status") =!= "")
      .groupBy("fetch_status")
      .agg(count("fetch_status").as("Count"))

  /** Filter a source frame to one entity. The reference splices the entity id
    * into SQL text (`report_engine.py:99`, an injection hazard); here it is a
    * bound column predicate, pushed down to the scan by Catalyst.
    */
  def forEntity(df: DataFrame, entityCol: String, entityId: String): DataFrame =
    df.filter(col(entityCol) === lit(entityId))
}
