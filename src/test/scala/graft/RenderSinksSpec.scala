package graft

import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.engine.{FunnelAggregates, FunnelRender, FunnelTable}
import graft.io.{MockData, Recipients, Sinks}

/** Presentation grid, xlsx sink, and recipients config — the edges
  * around the canonical table (golden values from FIXTURES.md §3).
  */
class RenderSinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private lazy val grid = {
    val wide = FunnelTable.wide(
      FunnelAggregates.stageTotals(MockData.stages(spark)),
      MockData.otpTotals(spark), MockData.discoveryTotals(spark),
      MockData.fiStatusCounts(spark))
    FunnelRender.grid(FunnelTable.rows(wide), FunnelTable.summary(wide))
  }

  test("grid is the reference's 24-row layout with golden summary cells") {
    val rows = grid.collect()
    assert(rows.length === 24)
    val byOrd = rows.map(r => r.getInt(0) -> r).toMap
    assert(byOrd(0).getString(1) === "Summary")
    assert(byOrd(1).getString(2) === "16.2") // approved pct as text
    assert(byOrd(2).getString(2) === "10.6") // shared pct
    assert(byOrd(5).getString(1) === "Stage") // column header row
    assert(byOrd(6).getString(3) === "7700") // Consent Initiated count
    assert(byOrd(11).getString(6) === "-150") // negative subcause, no clamp
    assert(byOrd(20).getString(6) === "") // blank row renders "", not 0
  }

  test("xlsx sink writes a valid zip with the golden values as cells") {
    val path = Files.createTempFile("funnel", ".xlsx").toString
    Sinks.xlsx(grid.drop("ord").collect().toSeq, path)
    val zf = new ZipFile(path)
    try {
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names.contains("xl/worksheets/sheet1.xml"))
      assert(names.contains("[Content_Types].xml"))
      val xml = new String(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes())
      Seq("16.2", "10.6", "7700", "-150", "89.6").foreach(v =>
        assert(xml.contains(s"<v>$v</v>"), s"missing numeric cell $v"))
      assert(xml.contains("Consent Initiated"))
      // XML escaping of data strings
      assert(!xml.contains("& "))
    } finally zf.close()
    Files.delete(Paths.get(path))
  }

  test("recipients.json parses to/cc maps with default-cc fallback") {
    val r = Recipients.parse(
      """{"to": {"a": ["x@e.com"], "b": ["y@e.com", "z@e.com"]},
        |"cc": {"a": ["c@e.com"], "default": ["d@e.com"]}}""".stripMargin)
    assert(r.to("b") === Seq("y@e.com", "z@e.com"))
    assert(r.ccFor("a") === Seq("c@e.com"))
    assert(r.ccFor("b") === Seq("d@e.com")) // falls back to default
    // missing cc section entirely -> fallback constant
    val r2 = Recipients.parse("""{"to": {"a": ["x@e.com"]}}""")
    assert(r2.ccFor("a") === Recipients.fallbackDefaultCc)
  }

  test("real-source mode: full orchestration over the CSV fixture with per-entity isolation") {
    import graft.app.RunReports
    import graft.io.{FunnelCsvFixture => Fx}
    val base = Files.createTempDirectory("run-e2e").toString
    Fx.write(base, Fx.defaultDays)
    val out = Files.createTempDirectory("run-e2e-out").toString
    // fiu-a and fiu-b have data; ghost-fiu must fail in isolation
    // without killing the run
    val rec = Files.createTempFile("recipients", ".json")
    Files.writeString(rec,
      """{"to": {"fiu-a": ["a@x"], "fiu-b": ["b@x"], "ghost-fiu": ["g@x"]},
        |"cc": {"default": ["cc@x"]}}""".stripMargin)

    val failures = RunReports.run(spark, RunReports.Args(
      base = Some(base), date = Some("31_01_2026 -> 01_02_2026"),
      recipients = Some(rec.toString), out = out))
    assert(failures === 1) // only the ghost entity

    Seq("fiu-a", "fiu-b").foreach { e =>
      val stem = s"$out/funnel_report-$e-31_01_2026-01_02_2026"
      val table = spark.read.parquet(s"$stem.parquet")
      assert(table.count() === 18, s"missing/short table for $e")
      assert(Files.exists(Paths.get(s"$stem.xlsx")))
    }
    assert(!Files.list(Paths.get(out)).iterator().asScala
      .exists(_.getFileName.toString.contains("ghost")))
  }

  test("email sink skips cleanly without SMTP config") {
    assert(!Sinks.emailOrSkip(Seq("a@e.com"), Nil, "subject", "/tmp/x.xlsx"))
  }
}
