package graft.io

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import javax.net.ssl.SSLSocketFactory

/** Minimal SMTP client over plain JDK sockets — no mail library ships
  * in this environment, and SMTP is a simple line protocol, so the
  * reference's delivery step (`run_reports.py:132-166`: STARTTLS,
  * AUTH LOGIN, MIME multipart with base64 attachments) is implemented
  * directly: EHLO → [STARTTLS → EHLO] → AUTH LOGIN → MAIL FROM →
  * RCPT TO (to + cc) → DATA → QUIT, every step checked against its
  * expected reply class.
  *
  * One deliberate MIME deviation from the reference: it attaches
  * plain, html, AND the files into a single `multipart/alternative`
  * (so a conforming client renders only the last part); here the
  * bodies sit in a proper `multipart/alternative` nested inside
  * `multipart/mixed` with the attachments — same content, structure a
  * mail client actually renders.
  */
object Smtp {

  final case class Config(host: String, port: Int, user: String,
      password: String, from: String, startTls: Boolean = true)

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  /** RFC 2045 base64 of a file: 76-char lines, CRLF. */
  private def b64File(path: String): String =
    Base64.getMimeEncoder(76, Array('\r', '\n'))
      .encodeToString(Files.readAllBytes(Paths.get(path)))

  /** The reference derives the plain body from the html one
    * (`run_reports.py:147`): same tag-strip here.
    */
  private[graft] def plainOf(html: String): String =
    html.replace("<br>", "\n").replace("<b>", "").replace("</b>", "")

  /** Assemble the RFC 5322 message (headers + MIME body), CRLF lines.
    * Exposed for tests — the wire send transmits exactly this, dot-
    * stuffed.
    */
  private[graft] def message(from: String, to: Seq[String], cc: Seq[String],
      subject: String, bodyHtml: String, attachments: Seq[String]): String = {
    val mixed = "graft-mixed-boundary"
    val alt = "graft-alt-boundary"
    val headers = Seq(
      s"From: $from",
      s"To: ${to.mkString(", ")}") ++
      (if (cc.nonEmpty) Seq(s"Cc: ${cc.mkString(", ")}") else Nil) ++ Seq(
      s"Subject: $subject",
      "MIME-Version: 1.0",
      s"""Content-Type: multipart/mixed; boundary="$mixed"""")
    val bodies = Seq(
      s"--$mixed",
      s"""Content-Type: multipart/alternative; boundary="$alt"""",
      "",
      s"--$alt",
      """Content-Type: text/plain; charset="utf-8"""",
      "",
      plainOf(bodyHtml),
      s"--$alt",
      """Content-Type: text/html; charset="utf-8"""",
      "",
      bodyHtml,
      s"--$alt--")
    val parts = attachments.filter(p => Files.isRegularFile(Paths.get(p)))
      .flatMap { p =>
        val name = Paths.get(p).getFileName.toString
        Seq(
          s"--$mixed",
          "Content-Type: application/octet-stream",
          "Content-Transfer-Encoding: base64",
          s"""Content-Disposition: attachment; filename="$name"""",
          "",
          b64File(p))
      }
    (headers ++ Seq("") ++ bodies ++ parts ++ Seq(s"--$mixed--"))
      .mkString("\r\n")
  }

  /** Send one message. Returns true on a completed (250-acknowledged)
    * DATA exchange; logs and returns false on any protocol or network
    * failure — mirroring the reference's never-throw contract.
    */
  def send(cfg: Config, to: Seq[String], cc: Seq[String], subject: String,
      bodyHtml: String, attachments: Seq[String],
      timeoutMs: Int = 15000): Boolean = {
    var sock: Socket = null
    try {
      sock = new Socket()
      sock.connect(new InetSocketAddress(cfg.host, cfg.port), timeoutMs)
      sock.setSoTimeout(timeoutMs)

      var in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      var out = new OutputStreamWriter(
        sock.getOutputStream, StandardCharsets.UTF_8)

      // multi-line replies: "250-..." continues, "250 ..." ends
      def reply(): String = {
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        if (first == null) sys.error("connection closed") else first
      }
      def cmd(c: String, expect: Char): Unit = {
        out.write(c + "\r\n"); out.flush()
        val r = reply()
        require(r.nonEmpty && r.charAt(0) == expect, s"$c -> $r")
      }

      require(reply().startsWith("2"), "no greeting")
      cmd("EHLO graft", '2')
      if (cfg.startTls) {
        cmd("STARTTLS", '2')
        val ssl = SSLSocketFactory.getDefault.asInstanceOf[SSLSocketFactory]
          .createSocket(sock, cfg.host, cfg.port, true)
        sock = ssl
        in = new BufferedReader(
          new InputStreamReader(ssl.getInputStream, StandardCharsets.UTF_8))
        out = new OutputStreamWriter(
          ssl.getOutputStream, StandardCharsets.UTF_8)
        cmd("EHLO graft", '2')
      }
      cmd("AUTH LOGIN", '3')
      cmd(b64(cfg.user), '3')
      cmd(b64(cfg.password), '2')
      cmd(s"MAIL FROM:<${cfg.from}>", '2')
      (to ++ cc).foreach(a => cmd(s"RCPT TO:<$a>", '2'))
      cmd("DATA", '3')
      // dot-stuffing (RFC 5321 §4.5.2): a leading '.' on any line doubles
      val payload = message(cfg.from, to, cc, subject, bodyHtml, attachments)
        .split("\r\n", -1)
        .map(l => if (l.startsWith(".")) "." + l else l)
        .mkString("\r\n")
      out.write(payload + "\r\n.\r\n"); out.flush()
      require(reply().startsWith("2"), "DATA not accepted")
      cmd("QUIT", '2')
      true
    } catch {
      case e: Throwable =>
        println(s"[email] send failed: ${e.getMessage}")
        false
    } finally if (sock != null) try sock.close() catch { case _: Throwable => () }
  }
}
