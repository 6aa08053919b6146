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

  // ---- styled workbook vs the reference's golden artifact ----

  /** Parse a workbook into (cells: ref -> (value, resolvedStyle),
    * merges, colWidths). Styles resolve to (fillRgb, bordered, wrap) so
    * shared-strings vs inline-strings and xf index ordering don't
    * matter — only the visible presentation does.
    */
  private def parseWorkbook(path: String) = {
    val zf = new ZipFile(path)
    try {
      def read(n: String) =
        new String(zf.getInputStream(zf.getEntry(n)).readAllBytes())
      val sheet = read("xl/worksheets/sheet1.xml")
      val styles = read("xl/styles.xml")
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(_ => read("xl/sharedStrings.xml"))

      val fillRe = "<fill>(.*?)</fill>".r
      val fills = fillRe.findAllMatchIn(styles).map(_.group(1)).map { f =>
        "rgb=\"([0-9A-F]+)\"".r.findFirstMatchIn(f).map(_.group(1)).getOrElse("")
      }.toVector
      // lazy attr match: a greedy [^>]* would swallow a self-closing
      // xf's '/' and fuse it with the next element
      val xfRe = "<xf ([^>]*?)(?:/>|>(.*?)</xf>)".r
      val cellXfsBlock =
        styles.substring(styles.indexOf("<cellXfs"), styles.indexOf("</cellXfs>"))
      val xfs = xfRe.findAllMatchIn(cellXfsBlock).map { m =>
        def attr(n: String) = (n + "=\"(\\d+)\"").r
          .findFirstMatchIn(m.group(1)).map(_.group(1).toInt).getOrElse(0)
        val wrap = Option(m.group(2)).exists(_.contains("wrapText=\"1\""))
        (fills(attr("fillId")), attr("borderId") > 0, wrap)
      }.toVector

      val strings = shared.map { s =>
        "<t[^>]*>(.*?)</t>".r.findAllMatchIn(s).map(_.group(1)).toVector
      }.getOrElse(Vector.empty)
      def unescape(s: String) = s.replace("&amp;", "&").replace("&lt;", "<")
        .replace("&gt;", ">").replace("&quot;", "\"")

      val cellRe =
        "<c r=\"([A-Z]+\\d+)\"(?: s=\"(\\d+)\")?(?: t=\"(\\w+)\")?(?:/>|>(.*?)</c>)".r
      val cells = cellRe.findAllMatchIn(sheet).map { m =>
        val ref = m.group(1)
        val s = Option(m.group(2)).map(_.toInt).getOrElse(0)
        val t = Option(m.group(3)).getOrElse("")
        val body = Option(m.group(4)).getOrElse("")
        val vRe = "<v>(.*?)</v>".r
        val raw = t match {
          case "s" => vRe.findFirstMatchIn(body)
            .map(v => strings(v.group(1).toInt)).getOrElse("")
          case "inlineStr" => "<t[^>]*>(.*?)</t>".r.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("")
          case _ => vRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
        }
        ref -> (unescape(raw), xfs(s))
      }.toMap
      val merges = "<mergeCell ref=\"([^\"]+)\"/>".r
        .findAllMatchIn(sheet).map(_.group(1)).toSet
      val widths = "<col min=\"(\\d+)\" max=\"(\\d+)\" width=\"([0-9.]+)\"".r
        .findAllMatchIn(sheet)
        .flatMap(m => (m.group(1).toInt to m.group(2).toInt)
          .map(_ -> m.group(3).toDouble)).toMap
      (cells, merges, widths)
    } finally zf.close()
  }

  private val goldenPath =
    "/root/reference/Funnel Report ETL Pipeline /output/" +
      "demo_funnel_report-15_02_2026.xlsx"

  test("styled workbook reproduces the golden's merges, widths, and per-cell styles") {
    assume(Files.exists(Paths.get(goldenPath)))
    val path = Files.createTempFile("funnel-styled", ".xlsx").toString
    val blank = org.apache.spark.sql.Row.fromSeq(Seq.fill(7)(""))
    Sinks.xlsxFunnel(blank +: grid.drop("ord").collect().toSeq, path)

    val (gCells, gMerges, gWidths) = parseWorkbook(goldenPath)
    val (oCells, oMerges, oWidths) = parseWorkbook(path)

    assert(oMerges === gMerges)
    assert(oWidths === gWidths)
    // cell-for-cell: same refs, same resolved (fill, border, wrap),
    // same value (numbers float-compared: the reference writes raw
    // IEEE doubles where the grid renders the reference UI's string)
    assert(oCells.keySet === gCells.keySet,
      s"cell set diff: extra=${oCells.keySet -- gCells.keySet} " +
        s"missing=${gCells.keySet -- oCells.keySet}")
    gCells.foreach { case (ref, (gv, gStyle)) =>
      val (ov, oStyle) = oCells(ref)
      assert(oStyle === gStyle, s"style mismatch at $ref")
      (gv.toDoubleOption, ov.toDoubleOption) match {
        case (Some(g), Some(o)) =>
          assert(math.abs(g - o) <= math.abs(g) * 1e-9 + 1e-9,
            s"numeric mismatch at $ref: golden=$gv ours=$ov")
        case _ =>
          // the golden's one truncated-vs-full string is identical text
          assert(ov === gv, s"value mismatch at $ref")
      }
    }
    Files.delete(Paths.get(path))
  }

  test("styled workbook round-trips the reference's format table, no golden read") {
    // The inverse of the golden diff: OUR workbook, parsed back, must
    // match a format table transcribed INDEPENDENTLY from
    // run_reports.py:74-125 (widths :74-80, format defs :82-89, summary
    // merges :91-94, the r6-24 cell loop :96-112 with its c==4/header
    // quirk, summary cells :114-120, stage merges :122-125) — so
    // styling parity survives refactors even without the reference
    // artifact on disk.
    val path = Files.createTempFile("funnel-rt", ".xlsx").toString
    val blank = org.apache.spark.sql.Row.fromSeq(Seq.fill(7)(""))
    Sinks.xlsxFunnel(blank +: grid.drop("ord").collect().toSeq, path)
    val (cells, merges, widths) = parseWorkbook(path)

    assert(merges === Set("D2:E2", "D3:E3", "C6:D6", "F6:G6",
      "A10:A13", "A14:A18", "A20:A22"))
    // set_column widths + xlsxwriter's +0.7109375 char-to-pixel pad
    assert(widths === Map(1 -> 45.7109375, 2 -> 45.7109375,
      3 -> 14.7109375, 4 -> 15.7109375, 5 -> 55.7109375,
      6 -> 14.7109375, 7 -> 16.7109375))

    // resolved (fillRgb, bordered, wrap) per named xlsxwriter format
    val f = Map(
      "gray"   -> (("FFD9D9D9", true, false)),
      "green"  -> (("FFAAECC6", true, false)),
      "dark"   -> (("FFF5C8A7", true, false)),
      "light"  -> (("FFFAE4D3", true, false)),
      "border" -> (("", true, false)),
      "note_g" -> (("FFD9D9D9", true, true)),
      "note_w" -> (("", true, true)),
      "stage"  -> (("FFD9D9D9", true, true)))
    val success = Set(7, 8, 9, 13, 18, 19, 22, 23, 24)
    val sub = Set(10, 11, 12, 14, 15, 16, 17, 20, 21)
    val exp = scala.collection.mutable.Map[(Int, Int), String]()
    for (r <- 6 to 24; c <- 0 to 6) {
      var s = "border"
      if (r == 6 || c == 0) s = "gray"
      if ((c == 1 || c == 2 || c == 3) && success(r)) s = "green"
      if (c == 4) s = if (success(r)) "dark"
        else if (sub(r)) "light" else "border"
      if ((c == 5 || c == 6) && success(r)) s = "dark"
      exp((r, c)) = s
    }
    exp((1, 0)) = "gray"; exp((1, 1)) = "gray"
    for (r <- 2 to 3; c <- 0 to 1) exp((r, c)) = "border"
    for (c <- 3 to 4) { exp((1, c)) = "note_g"; exp((2, c)) = "note_w" }
    for (c <- 2 to 3) exp((5, c)) = "gray"
    for (c <- 5 to 6) exp((5, c)) = "gray"
    for (r <- 9 to 12) exp((r, 0)) = "stage"
    for (r <- 13 to 17) exp((r, 0)) = "stage"
    for (r <- 19 to 21) exp((r, 0)) = "stage"

    def ref(r: Int, c: Int) = s"${('A' + c).toChar}${r + 1}"
    assert(cells.keySet === exp.keySet.map { case (r, c) => ref(r, c) })
    exp.foreach { case ((r, c), name) =>
      assert(cells(ref(r, c))._2 === f(name),
        s"style mismatch at ${ref(r, c)}: expected $name")
    }
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

  test("SMTP client: full dialogue against an in-process server, MIME intact") {
    import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
    import java.net.ServerSocket
    import graft.io.Smtp

    val attach = Files.createTempFile("report", ".xlsx")
    val payloadBytes = Array[Byte](80, 75, 3, 4, 0, -1, 42) // zip-ish bytes
    Files.write(attach, payloadBytes)

    val server = new ServerSocket(0)
    val data = new StringBuilder
    val rcpts = scala.collection.mutable.ArrayBuffer[String]()
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream))
      val out = new OutputStreamWriter(s.getOutputStream)
      def w(l: String): Unit = { out.write(l + "\r\n"); out.flush() }
      w("220 test ESMTP")
      var line = in.readLine()
      var inData = false
      var authStep = 0 // 0 none, 1 expect username, 2 expect password
      while (line != null) {
        if (inData) {
          if (line == ".") { inData = false; w("250 ok") }
          else data.append(
            (if (line.startsWith("..")) line.substring(1) else line) + "\r\n")
        } else if (authStep == 1) { authStep = 2; w("334 UGFzc3dvcmQ6") }
        else if (authStep == 2) { authStep = 0; w("235 ok") }
        else line.split(" ", 2)(0).toUpperCase match {
          case "EHLO" => w("250-test"); w("250 AUTH LOGIN")
          case "AUTH" => authStep = 1; w("334 VXNlcm5hbWU6")
          case "MAIL" => w("250 ok")
          case "RCPT" => rcpts += line; w("250 ok")
          case "DATA" => inData = true; w("354 go")
          case "QUIT" => w("221 bye"); line = null
          case _ => w("250 ok")
        }
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.start()

    val cfg = Smtp.Config("127.0.0.1", server.getLocalPort, "u", "p",
      from = "from@e.com", startTls = false)
    val sent = Smtp.send(cfg, Seq("to@e.com"), Seq("cc@e.com"),
      "Funnel 01-01-2024", "<b>hi</b><br>line", Seq(attach.toString))
    t.join(10000)
    server.close()
    assert(sent, "send must complete against the stub server")
    assert(rcpts.toList === List("RCPT TO:<to@e.com>", "RCPT TO:<cc@e.com>"))
    val msg = data.toString
    assert(msg.contains("Subject: Funnel 01-01-2024"))
    assert(msg.contains("To: to@e.com") && msg.contains("Cc: cc@e.com"))
    assert(msg.contains("multipart/mixed") && msg.contains("text/html"))
    // the base64 attachment round-trips to the exact file bytes
    val b64 = msg.split("\r\n").dropWhile(!_.contains("octet-stream"))
      .dropWhile(_.nonEmpty).drop(1).takeWhile(l => l.nonEmpty && !l.startsWith("--"))
      .mkString
    assert(java.util.Base64.getDecoder.decode(b64).toSeq === payloadBytes.toSeq)
    // plain body derives from html the way the reference strips tags
    assert(Smtp.plainOf("<b>hi</b><br>line") === "hi\nline")
  }
}
