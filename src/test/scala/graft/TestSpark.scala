package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are expensive;
  * suites share via getOrCreate).
  */
object TestSpark {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
