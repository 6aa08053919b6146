// Round-17 stream-family probe: where does a micro-batch replay's time
// actually go? Runs a registered stream query once per configuration
// (changelog checkpointing off/on), with a StreamingQueryListener
// dumping per-batch durationMs and the state operators' aggregate
// RocksDB metrics. Drives the decision on which state-store posture
// the engine pins (see GraftSession.withRocksDbState).
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --jars target/scala-2.13/funnelreportetlpipelinespark_2.13-0.1.0.jar \
//     -I tools/stream_probe_r17.scala
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.ansi.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.sparkContext.setLogLevel("WARN")

val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()

spark.streams.addListener(new StreamingQueryListener {
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    val sb = new StringBuilder
    sb ++= s"batch ${p.batchId}: total=${dur.get("triggerExecution")}ms "
    sb ++= s"addBatch=${dur.get("addBatch")} getBatch=${dur.get("getBatch")} "
    sb ++= s"latestOffset=${dur.get("latestOffset")} "
    sb ++= s"walCommit=${dur.get("walCommit")} commitOffsets=${dur.get("commitOffsets")} "
    sb ++= s"planning=${dur.get("queryPlanning")} rows=${p.numInputRows}"
    p.stateOperators.foreach { so =>
      sb ++= s"\n    op=${so.operatorName} commitMs=${so.commitTimeMs} "
      val cm = so.customMetrics
      def g(k: String) = Option(cm.get(k)).getOrElse(0L)
      sb ++= s"rocksdbCommitCheckpoint=${g("rocksdbCommitCheckpointLatency")} "
      sb ++= s"rocksdbFileSync=${g("rocksdbCommitFileSyncLatencyMs")} "
      sb ++= s"rocksdbCommitFlush=${g("rocksdbCommitFlushLatency")} "
      sb ++= s"rocksdbCommitCompact=${g("rocksdbCommitCompactLatency")} "
      sb ++= s"rocksdbWriteBatch=${g("rocksdbWriteBatchLatency")} "
      sb ++= s"loadedMapCacheHit=${g("loadedMapCacheHitCount")} "
      sb ++= s"snapshotLastUploaded=${g("rocksdbSnapshotLastUploadedVersion")}"
    }
    lines.add(sb.toString)
  }
})

def runOnce(name: String, changelog: Boolean): Unit = {
  lines.clear()
  spark.conf.set(
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
    changelog.toString)
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
    .write.mode("overwrite").format("noop").save()
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"\n=== $name changelog=$changelog: $sec%.2f s ===")
  lines.forEach(l => println(l))
}

// warm (JIT/codegen), then one measured run per configuration
runOnce("stream_stream_join", changelog = false)
runOnce("stream_stream_join", changelog = false)
runOnce("stream_stream_join", changelog = true)
runOnce("stream_dedup_counts", changelog = false)
runOnce("stream_dedup_counts", changelog = true)
System.exit(0)
