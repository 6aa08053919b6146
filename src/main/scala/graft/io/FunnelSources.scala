package graft.io

import java.time.LocalDate

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.{DateSpec, Schemas}
import graft.engine.FunnelAggregates

/** CSV source layer for the four funnel families — replaces the
  * reference's `run_sql` + `fetch_*` REST round-trips
  * (`report_engine.py:48-199`) with direct Spark CSV scans.
  *
  * Partition selection happens by PATH CONSTRUCTION, exactly like the
  * reference (`report_engine.py:89-112`): a Day spec reads one
  * `dd_MM_yyyy` directory; Month reads a `*MM_yyyy` glob (dir AND file
  * segment, mirroring `report_engine.py:84,99`); Range reads month globs
  * then post-filters rows on the `Date` column (`dd-MM-yyyy`, dashes —
  * `report_engine.py:104-107`) for sources that carry it, and exact
  * day-path lists for the summary/fact sources (the reference's 3×N
  * per-day queries become ONE multi-path scan — Catalyst still prunes by
  * path, but there's a single job, not N sequential round-trips).
  *
  * Missing days degrade to an empty frame, never an error — the
  * reference's Drill-failure posture (`report_engine.py:60-62`,
  * `run_reports.py:219-221`). Schemas are explicit and string-typed
  * (casts live in [[graft.engine.FunnelAggregates]]); entity selection
  * is a bound column predicate (pushed to the scan), never spliced text.
  */
object FunnelSources {

  /** File-name prefixes per source family (`report_engine.py:99,126,154,180`). */
  val stagesPrefix = "uf-stages-user-funnel"
  val otpPrefix = "otp-summary-user-funnel"
  val discoveryPrefix = "discovery-summary-user-funnel"
  val userFunnelPrefix = "user-funnel"

  private def dayPath(base: String, prefix: String, d: LocalDate): String = {
    val t = DateSpec.formatDay(d)
    s"$base/$t/$prefix-$t.csv"
  }

  private def monthGlobPath(base: String, prefix: String, glob: String): String =
    s"$base/$glob/$prefix-$glob.csv"

  /** Expand candidate paths/globs to the ones that actually exist —
    * Spark errors on missing input paths, the reference degrades to
    * empty (`report_engine.py:60-62`).
    */
  private def existing(spark: SparkSession, paths: Seq[String]): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.filter { p =>
      val path = new Path(p)
      val fs = FileSystem.get(path.toUri, conf)
      Option(fs.globStatus(path)).exists(_.nonEmpty)
    }
  }

  private def scan(spark: SparkSession, schema: StructType,
      paths: Seq[String]): DataFrame = {
    val present = existing(spark, paths)
    if (present.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else
      spark.read.schema(schema).option("header", true).csv(present: _*)
  }

  /** Stage metrics (S1): Day → one path; Month/Range → month globs, with
    * the Range case post-filtered on the row `Date` column parsed
    * `dd-MM-yyyy` — the only source family carrying a date column.
    */
  def stages(spark: SparkSession, base: String, spec: DateSpec,
      entityId: Option[String] = None): DataFrame = {
    val df = spec match {
      case DateSpec.Day(d) =>
        scan(spark, Schemas.stages, Seq(dayPath(base, stagesPrefix, d)))
      case m: DateSpec.Month =>
        scan(spark, Schemas.stages,
          m.monthPrefixes.map(monthGlobPath(base, stagesPrefix, _)))
      case r: DateSpec.Range =>
        scan(spark, Schemas.stages,
          r.monthPrefixes.map(monthGlobPath(base, stagesPrefix, _)))
          .filter(to_date(col("Date"), "dd-MM-yyyy")
            .between(lit(r.start.toString), lit(r.end.toString)))
    }
    entityId.fold(df)(e => FunnelAggregates.forEntity(df, "Entity_ID", e))
  }

  private def daySource(spark: SparkSession, base: String, prefix: String,
      schema: StructType, spec: DateSpec, entityId: Option[String]): DataFrame = {
    val df = scan(spark, schema, spec.days.map(dayPath(base, prefix, _)))
    entityId.fold(df)(e => FunnelAggregates.forEntity(df, "entity_id", e))
  }

  /** OTP summaries (S2): exact day-path list for every spec shape. */
  def otp(spark: SparkSession, base: String, spec: DateSpec,
      entityId: Option[String] = None): DataFrame =
    daySource(spark, base, otpPrefix, Schemas.otpSummary, spec, entityId)

  /** Discovery summaries (S3). */
  def discovery(spark: SparkSession, base: String, spec: DateSpec,
      entityId: Option[String] = None): DataFrame =
    daySource(spark, base, discoveryPrefix, Schemas.discoverySummary, spec, entityId)

  /** Per-user funnel facts (S4). */
  def userFunnel(spark: SparkSession, base: String, spec: DateSpec,
      entityId: Option[String] = None): DataFrame =
    daySource(spark, base, userFunnelPrefix, Schemas.userFunnel, spec, entityId)

  // ---- Hive-partitioned parquet layout (the at-scale alternative) ----
  //
  // Path templating (above) mirrors the reference exactly, but at 100 TB
  // the canonical layout is a `date=YYYY-MM-DD/` partitioned parquet
  // table: partition selection becomes a PLANNED predicate
  // (PruneFileSourcePartitions), pruning happens before any file is
  // listed into the scan, and the same table serves every date range
  // without path arithmetic.

  /** One-time ingest: a raw CSV-layout source re-written as partitioned
    * parquet, the row `Date` (dd-MM-yyyy) becoming the `date` partition
    * column. Dynamic partition write — one output dir per day.
    */
  def ingestPartitioned(stagesRaw: DataFrame, outDir: String): Unit =
    stagesRaw
      // distinct temp name: withColumn("date") would case-insensitively
      // REPLACE the existing string `Date` column instead of adding one
      .withColumn("__part_date", to_date(col("Date"), "dd-MM-yyyy"))
      // the string Date column is redundant with the partition value,
      // and keeping both would make `Date`/`date` ambiguous
      .drop("Date")
      .withColumnRenamed("__part_date", "date")
      .write.mode("overwrite")
      .partitionBy("date")
      .parquet(outDir)

  /** Scan the partitioned layout with a spec-derived PARTITION predicate:
    * Catalyst prunes non-matching `date=` directories at planning time
    * (visible as `PartitionFilters` on the scan — asserted in
    * FunnelSourcesSpec), so a Day spec reads one directory out of
    * however many the table holds, without any path construction.
    */
  def stagesPartitioned(spark: SparkSession, dir: String, spec: DateSpec,
      entityId: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(dir)
    val pruned = spec match {
      case DateSpec.Day(d) => df.filter(col("date") === lit(d.toString))
      // raw comparisons on the partition column only: wrapping it in a
      // function (e.g. date_format) would block partition pruning
      case m: DateSpec.Month =>
        df.filter(col("date").between(
          lit(m.month.atDay(1).toString), lit(m.month.atEndOfMonth.toString)))
      case r: DateSpec.Range =>
        df.filter(col("date").between(lit(r.start.toString), lit(r.end.toString)))
    }
    entityId.fold(pruned)(e => FunnelAggregates.forEntity(pruned, "Entity_ID", e))
  }
}
