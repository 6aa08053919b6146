package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Analytics, CsvFunnelReport, Curation, FunnelOverEvents, Inference, Insights, LlmQueries, Relational, Scoring, Signals}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator family registers here: a Spark query over
  * the harness's parquet tables plus a value-identical DuckDB oracle —
  * EVERY query carries one. Paths DuckDB cannot replay directly (seeded
  * MLlib projections) register through a recall gate ([[graft.llm
  * .Similarity]]): they emit the exact, oracle-expressible result only
  * when the approximate path recovers enough of it, so recall drift
  * trips the driver's row compare.
  */
object SparkEntry {
  /** Flagship: the full funnel pipeline over sf0.001 events (18-row report
    * table); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    FunnelOverEvents.query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmQueries.queries ++ Analytics.queries ++
      Scoring.queries ++ Signals.queries ++ Insights.queries ++
      Inference.queries ++ Curation.queries +
      ("funnel_table" -> (FunnelOverEvents.query(_, _))) +
      // the funnel aggregation run as a real Structured Streaming query
      // (readStream → global complete-mode agg → memory sink), hash-
      // checked against the SAME oracle as the batch funnel_table
      ("stream_funnel_table" -> (FunnelOverEvents.streamQuery(_, _))) +
      // CSV source layer end-to-end (path templating, month glob, range
      // post-filter, entity pushdown) over a generated on-disk fixture
      // in the reference's directory layout, oracle-checked by DuckDB
      // read_csv over the same files.
      ("csv_funnel_report" -> (CsvFunnelReport.query(_, _))) +
      // same report over the at-scale layout: stages ingested once as a
      // date=-partitioned parquet table (with a decoy out-of-range day)
      // and pruned by a planned partition predicate, not path strings
      ("csv_funnel_partitioned" -> (CsvFunnelReport.partitionedQuery(_, _))) +
      // per-file provenance via the _metadata hidden column, against
      // DuckDB read_csv(filename = true) over the same files
      ("file_lineage" -> (CsvFunnelReport.lineageQuery(_, _)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ LlmQueries.oracles ++ Analytics.oracles ++
      Scoring.oracles ++ Signals.oracles ++ Insights.oracles ++
      Inference.oracles ++ Curation.oracles +
      ("funnel_table" -> FunnelOverEvents.oracle) +
      // stream/batch parity IS the claim: one oracle serves both paths
      ("stream_funnel_table" -> FunnelOverEvents.oracle) +
      ("csv_funnel_report" -> CsvFunnelReport.oracle) +
      // the partitioned layout must reproduce the CSV-path result
      // exactly — one oracle serves both
      ("csv_funnel_partitioned" -> CsvFunnelReport.oracle) +
      ("file_lineage" -> CsvFunnelReport.lineageOracle)
}
