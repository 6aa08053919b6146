package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}

/** Sinks for the funnel report (SURVEY §2.1).
  *
  * The CANONICAL sinks are parquet/csv of the typed table —
  * driver-verifiable. Both are SINGLE-FILE, REPORT-SIZED sinks
  * (`coalesce(1)` so each report is one artifact, like the reference's
  * one xlsx per entity): a large query result should use
  * `df.write.parquet` directly, not these. The xlsx sink is a
  * driver-side render of the ≤25-row presentation grid (the reference's
  * `write_funnel_excel`, `run_reports.py:64-125`): collect() is correct
  * there BY DESIGN — a fixed-size report, not data. Written as minimal
  * SpreadsheetML with pure JDK zip (no external deps ship in this
  * environment); cell styling beyond types is presentation polish the
  * canonical sinks don't carry.
  */
object Sinks {

  /** Canonical: single-file parquet of the (report-sized) typed table. */
  def parquet(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** Canonical: single-file headered CSV of any small result. */
  def csv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)

  private def xml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private val numeric = """-?\d+(\.\d+)?""".r

  /** Minimal valid .xlsx (one sheet, inline strings, numeric cells for
    * numeric-looking values). The grid must already be collected — call
    * only on presentation-sized frames.
    */
  def xlsx(gridRows: Seq[Row], path: String,
      sheetName: String = "Funnel Dashboard"): Unit = {
    def cell(ref: String, v: String): String =
      if (v.isEmpty) ""
      else if (numeric.matches(v)) s"""<c r="$ref"><v>$v</v></c>"""
      else s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xml(v)}</t></is></c>"""

    def colRef(i: Int): String = { // 0 -> A, 26 -> AA
      var n = i; var s = ""
      while (n >= 0) { s = ('A' + n % 26).toChar.toString + s; n = n / 26 - 1 }
      s
    }

    val sheetRows = gridRows.zipWithIndex.map { case (r, ri) =>
      val cells = (0 until r.length).map { ci =>
        val v = Option(r.get(ci)).map(_.toString).getOrElse("")
        cell(s"${colRef(ci)}${ri + 1}", v)
      }.mkString
      s"""<row r="${ri + 1}">$cells</row>"""
    }.mkString

    val entries = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${xml(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$sheetRows</sheetData>
           |</worksheet>""".stripMargin
    )

    val zos = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }

  /** Email delivery — mirrors the reference's contract
    * (`run_reports.py:132-166`): skip cleanly (false) when SMTP is not
    * configured, otherwise STARTTLS-send a MIME multipart with the
    * report attached via [[Smtp]] and return whether the send
    * completed. Config from env: SMTP_HOST, SMTP_USER, SMTP_PASS
    * (all three required to attempt a send), optional SMTP_PORT
    * (default 587), SMTP_FROM (default user), SMTP_TLS=false to
    * disable STARTTLS (e.g. a local relay). Never throws — a failed
    * send logs and returns false, exactly like the reference.
    */
  def emailOrSkip(to: Seq[String], cc: Seq[String], subject: String,
      attachment: String): Boolean = {
    val env = sys.env
    (env.get("SMTP_HOST"), env.get("SMTP_USER"), env.get("SMTP_PASS")) match {
      case (Some(host), Some(user), Some(pass)) =>
        val cfg = Smtp.Config(host,
          env.get("SMTP_PORT").map(_.toInt).getOrElse(587),
          user, pass,
          from = env.getOrElse("SMTP_FROM", user),
          startTls = !env.get("SMTP_TLS").contains("false"))
        val body = s"<b>Funnel report</b><br>Attached: $subject"
        val sent = Smtp.send(cfg, to, cc, subject, body, Seq(attachment))
        println(s"[email] ${if (sent) "sent" else "send FAILED"}: " +
          s"to=${to.mkString(",")} subject=$subject")
        sent
      case _ =>
        println(s"[email] skipped (no SMTP config): " +
          s"to=${to.mkString(",")} subject=$subject")
        false
    }
  }
}
