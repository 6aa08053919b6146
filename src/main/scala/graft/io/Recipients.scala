package graft.io

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** recipients.json config source (`load_recipients`,
  * `run_reports.py:50-57`): entity → To list, entity → CC list, and a
  * default CC. Plain driver-side JSON parse (Jackson ships with Spark) —
  * config, not a distributed read.
  */
final case class Recipients(
    to: Map[String, Seq[String]],
    cc: Map[String, Seq[String]],
    defaultCc: Seq[String]) {
  def ccFor(entity: String): Seq[String] = cc.getOrElse(entity, defaultCc)
}

object Recipients {

  val fallbackDefaultCc: Seq[String] = Seq("cc@your-company.com")

  def parse(json: String): Recipients = {
    val root = new ObjectMapper().readTree(json)
    def section(name: String): Map[String, Seq[String]] =
      Option(root.get(name)).map { node =>
        node.properties().asScala.map { e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
        }.toMap
      }.getOrElse(Map.empty)
    val cc = section("cc")
    Recipients(section("to"), cc, cc.getOrElse("default", fallbackDefaultCc))
  }

  def load(path: String): Recipients =
    parse(Files.readString(Paths.get(path)))
}
