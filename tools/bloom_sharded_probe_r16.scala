// Round-16 probe (VERDICT item 1 "done" evidence): adaptive sharded
// Bloom decontamination at sf10 with a 10x blocklist — 2.5M entries vs
// r15's 250k — measuring that BOTH of the judge-named bounds hold:
//   (a) per-task filter bytes stay bounded (shards sized by
//       Dedup.bloomShardPlan: ~10 bits/entry, 32 MiB/shard cap), and
//   (b) the probe stage's TASK COUNT tracks the session's shuffle
//       width, not the shard count (the salt replication decoupling) —
//       r15's fixed nShards=16 capped the probe at 16 tasks forever.
// Output equality is asserted against the exact anti-join and the
// broadcast bloom path on the same inputs.
//
// REPL NOTE: every multi-line expression is parenthesized — the -I
// interpreter evaluates line by line and silently detaches leading-dot
// continuations from a syntactically complete `val` line.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.network.timeout=600s \
//     --jars target/scala-2.13/funnelreportetlpipelinespark_2.13-0.1.0.jar \
//     -I tools/bloom_sharded_probe_r16.scala
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.llm.Dedup

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.ansi.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")

// per-stage task counts, shuffle-read maxima, executor run time
case class St(var tasks: Int = 0, var maxRead: Long = 0L,
  var totRead: Long = 0L, var runMs: Long = 0L, var maxRunMs: Long = 0L)
val stages = scala.collection.mutable.LinkedHashMap[Int, St]()
val lst = new SparkListener {
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = stages.synchronized {
    val m = t.taskMetrics
    if (m != null) {
      val s = stages.getOrElseUpdate(t.stageId, St())
      s.tasks += 1
      val r = m.shuffleReadMetrics.totalBytesRead
      s.totRead += r
      if (r > s.maxRead) s.maxRead = r
      s.runMs += m.executorRunTime
      if (m.executorRunTime > s.maxRunMs) s.maxRunMs = m.executorRunTime
    }
  }
}
sc.addSparkListener(lst)
def drainStages(tag: String): Unit = stages.synchronized {
  Thread.sleep(500)
  println(s"== stages[$tag] (stageId tasks maxShufReadB totShufReadB sumRunMs maxRunMs)")
  stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
    println(f"  $id%5d ${s.tasks}%5d ${s.maxRead}%12d ${s.totRead}%14d ${s.runMs}%10d ${s.maxRunMs}%9d")
  }
  stages.clear()
}
def time[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"== wall[$tag] ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
}

val docs = spark.read.parquet("/root/repo/target/sf10/documents.parquet")
val corpus = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
// 10x blocklist: each odd doc contributes its real text (the planted
// cross-half duplicates keep hitting) plus 9 salted variants -> 2.5M
// rows, the variants matching no corpus doc
val blocklist = (docs.filter(pmod(col("doc_id"), lit(2)) === 1)
  .withColumn("__i", explode(sequence(lit(0), lit(9))))
  .select(col("doc_id"),
    when(col("__i") === 0, col("text"))
      .otherwise(concat(col("text"), lit(" variant"), col("__i"))).as("text")))
println(s"corpus=${corpus.count()} blocklist=${blocklist.count()}")
val bc = blocklist.count()
println(s"bloomShardPlan($bc) = ${Dedup.bloomShardPlan(bc)}")

def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = (df.agg(count(lit(1)),
    coalesce(sum(xxhash64(col("doc_id"))), lit(0L))).collect()(0))
  (r.getLong(0), r.getLong(1))
}

stages.synchronized(stages.clear())
val exactSig = time("exact_antijoin")(sig(Dedup.decontaminate(corpus, blocklist)))
drainStages("exact_antijoin")
// broadcast path, filter sized to the blocklist (the old 2^20 default
// SATURATES at 2.5M entries — ADVICE r15; 2^25 bits = 4 MiB broadcast)
val bloomSig = time("broadcast_bloom")(
  sig(Dedup.decontaminateBloom(corpus, blocklist, nBits = 1 << 25)))
drainStages("broadcast_bloom")
// fully adaptive sharded path: shards+bits from bloomShardPlan(count),
// salts to the 32-wide session; two reps, min is the plan's cost
val shardedSig = time("sharded_adaptive_rep1")(
  sig(Dedup.decontaminateBloomSharded(corpus, blocklist)))
drainStages("sharded_adaptive_rep1")
val shardedSig2 = time("sharded_adaptive_rep2")(
  sig(Dedup.decontaminateBloomSharded(corpus, blocklist)))
drainStages("sharded_adaptive_rep2")
// explicit multi-shard config (8 shards x 4 salts = 32 probe keys):
// exercises shard-count > 1 routing at the same scale
val sharded8Sig = time("sharded_8x4_rep1")(
  sig(Dedup.decontaminateBloomSharded(corpus, blocklist,
    nShards = 8, nSalts = 4)))
drainStages("sharded_8x4_rep1")
val sharded8Sig2 = time("sharded_8x4_rep2")(
  sig(Dedup.decontaminateBloomSharded(corpus, blocklist,
    nShards = 8, nSalts = 4)))
drainStages("sharded_8x4_rep2")

println(s"exact=$exactSig broadcast=$bloomSig adaptive=$shardedSig/$shardedSig2 8x4=$sharded8Sig/$sharded8Sig2")
assert(exactSig == bloomSig && bloomSig == shardedSig && shardedSig == shardedSig2
  && shardedSig == sharded8Sig && sharded8Sig == sharded8Sig2,
  "output mismatch between decontamination paths")
println("EQUALITY OK")
System.exit(0)
