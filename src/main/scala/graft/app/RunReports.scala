package graft.app

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.{Failure, Success, Try}

import graft.GraftSession
import graft.core.DateSpec
import graft.engine.{FunnelAggregates, FunnelRender, FunnelTable}
import graft.io.{FunnelSources, MockData, Recipients, Sinks}

/** Orchestration CLI — the reference's `run_reports.py` lifecycle
  * (`run_reports.py:172-248`): resolve config, default the date to
  * YESTERDAY (`run_reports.py:183`), loop entities with per-entity Try
  * isolation (one bad entity never kills the run), extract → transform →
  * load, emit parquet + csv + xlsx per entity, email-or-skip.
  *
  * Usage:
  *   RunReports --demo [--out DIR]
  *   RunReports --base DIR [--date SPEC] [--recipients FILE] [--out DIR]
  */
object RunReports {

  final case class Args(
      demo: Boolean = false,
      base: Option[String] = None,
      date: Option[String] = None,
      recipients: Option[String] = None,
      out: String = "target/reports")

  def parseArgs(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil => acc
    case "--demo" :: rest => parseArgs(rest, acc.copy(demo = true))
    case "--base" :: v :: rest => parseArgs(rest, acc.copy(base = Some(v)))
    case "--date" :: v :: rest => parseArgs(rest, acc.copy(date = Some(v)))
    case "--recipients" :: v :: rest => parseArgs(rest, acc.copy(recipients = Some(v)))
    case "--out" :: v :: rest => parseArgs(rest, acc.copy(out = v))
    case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
  }

  /** Yesterday, the reference's default reporting date (t-1 daily batch).
    * Resolved in UTC to agree with the session's pinned
    * `spark.sql.session.timeZone=UTC` and the UTC-partitioned source
    * layout — the JVM default zone near midnight would pick a different
    * day than the data partitions.
    */
  def defaultDate(today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): String =
    DateSpec.formatDay(today.minusDays(1))

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv.toList)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = run(spark, args)
    spark.stop()
    if (failures > 0) sys.exit(1)
  }

  /** Returns the number of failed entities. */
  def run(spark: SparkSession, args: Args): Int = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(args.out))
    val dateSpec = args.date.getOrElse(defaultDate())
    val recipients = args.recipients.map(Recipients.load)

    val entities: Seq[String] =
      if (args.demo) Seq("example-fiu")
      else recipients.map(_.to.keys.toSeq.sorted).getOrElse(Seq.empty)
    if (entities.isEmpty) {
      println("[run] no entities to report (provide --recipients or --demo)")
      return 0
    }

    val results = entities.map { entity =>
      entity -> Try(reportForEntity(spark, args, dateSpec, entity, recipients))
    }
    results.foreach {
      case (e, Success(path)) => println(s"[run] $e -> $path")
      case (e, Failure(ex)) =>
        println(s"[run] $e FAILED: ${ex.getClass.getSimpleName}: ${ex.getMessage}")
    }
    results.count(_._2.isFailure)
  }

  private def reportForEntity(spark: SparkSession, args: Args,
      dateSpec: String, entity: String,
      recipients: Option[Recipients]): String = {
    val wide: DataFrame =
      if (args.demo)
        // demo mode: the reference's mock fetch outputs (report_engine.py:326-367)
        FunnelTable.wide(
          FunnelAggregates.stageTotals(MockData.stages(spark)),
          MockData.otpTotals(spark), MockData.discoveryTotals(spark),
          MockData.fiStatusCounts(spark))
      else {
        val base = args.base.getOrElse(
          throw new IllegalArgumentException("--base required without --demo"))
        val spec = DateSpec.parse(dateSpec)
        val stages = FunnelSources.stages(spark, base, spec, Some(entity))
        // empty stage fetch -> skip entity, the reference's posture
        // (run_reports.py:219-221); the built table would be 18 zero
        // rows, which must never ship as a report
        if (stages.limit(1).isEmpty)
          throw new IllegalStateException(s"no data for $entity @ $dateSpec")
        FunnelTable.wide(
          FunnelAggregates.stageTotals(stages),
          FunnelAggregates.otpTotals(
            FunnelSources.otp(spark, base, spec, Some(entity))),
          FunnelAggregates.discoveryTotals(
            FunnelSources.discovery(spark, base, spec, Some(entity))),
          FunnelAggregates.fiStatusCounts(
            FunnelSources.userFunnel(spark, base, spec, Some(entity))))
      }

    val table = FunnelTable.rows(wide)

    val tag = dateSpec.replace(" ", "").replace("->", "-").replace("*", "m")
    val prefix = if (args.demo) "demo_funnel_report" else s"funnel_report-$entity"
    val stem = s"${args.out}/$prefix-$tag"

    Sinks.parquet(table, s"$stem.parquet")
    val grid = FunnelRender.grid(table, FunnelTable.summary(wide))
    Sinks.csv(grid, s"$stem.grid.csv")
    // presentation-sized collect — correct by design for xlsx. The
    // reference's excel writer prepends one blank row above the grid
    // (run_reports.py:66-67), making the golden file 25 rows.
    val blank = org.apache.spark.sql.Row.fromSeq(Seq.fill(7)(""))
    Sinks.xlsxFunnel(blank +: grid.drop("ord").collect().toSeq, s"$stem.xlsx")

    recipients.foreach { r =>
      Sinks.emailOrSkip(
        r.to.getOrElse(entity, Seq.empty), r.ccFor(entity),
        s"Funnel report $entity $dateSpec", s"$stem.xlsx")
    }
    s"$stem.{parquet,grid.csv,xlsx}"
  }
}
