package org.apache.spark.sql.execution.streaming.runtime

import org.apache.spark.sql.execution.QueryExecution

/** Compile-checked doorway to a classic streaming query's last
  * micro-batch execution, for graft's streaming plan-shape gate
  * (`graft.ops.PlanShape` / PLANSHAPES_STREAM.json).
  *
  * The micro-batch physical plan is where a streaming scale regression
  * (a lost broadcast, a stray cartesian, a stateful operator appearing
  * or vanishing) would hide: the read-back side of the verification
  * path only ever sees a bare parquet scan of the sink. Spark exposes
  * that plan on [[StreamExecution.lastExecution]], which — like
  * [[StreamingQueryWrapper.streamingQuery]] — is `private[sql]`, so
  * this one-file shim lives in Spark's package to reach it with the
  * compiler (not reflection) checking the access against the exact
  * Spark version on the classpath.
  */
object GraftMicroBatchAccess {

  /** The last completed micro-batch's execution, if the query is a
    * classic engine query that has run at least one batch.
    */
  def lastExecution(
      q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[QueryExecution] = q match {
    case w: StreamingQueryWrapper => Option(w.streamingQuery.lastExecution)
    case s: StreamExecution => Option(s.lastExecution)
    case _ => None
  }
}
