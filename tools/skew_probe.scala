// Round-13 AQE skew-split probe at sf10 (VERDICT r12 item 6): plant a
// 20k-document near-dup family (one boilerplate core + a per-doc unique
// token) into the 500k-doc sf10 corpus and run the REAL
// Dedup.minhashBandedPairs through it twice -- skew handling on and off --
// recording wall time and the split counts from the executed plan.
// Results land in PLANS.md next to the SkewSpec notes.
//
// Why a near-dup (not identical) family: identical docs produce one
// 12k-row band bucket whose rows compress ~10x (same signature, same
// band key), hiding the skew from AQE's compressed-byte stats; a
// one-unique-token family keeps ~75% of docs on the modal band key while
// the signatures differ row to row, so the hot partition's bytes are
// real. Same reasoning as SkewSpec's fixtures.
//
// Parameter notes -- each number below was forced by a measured effect
// (first attempts at 512/4096 partitions detected NOTHING; per-stage
// mapStats bytes told the story, recorded in PLANS.md round 13):
//  - byte skew vs compute skew: the family's rows are near-identical
//    (sigs differ in ~2 of 16 positions), so the shuffle stream
//    compresses them ~10x -- a 12k-doc family added only ~140 KB to a
//    594 KB median partition at 512 reducers. AQE detects COMPRESSED
//    bytes only; the 9k-row-squared join work was invisible. Fix:
//    2000 reducers shrink the median to ~160 KB and a 20k family's
//    modal band key adds ~215 KB -> 2.3x the median, detectable.
//  - partitions must stay <= 2000: above
//    spark.shuffle.minNumPartitionsToHighlyCompress the map status
//    switches to HighlyCompressedMapStatus, which reports the AVERAGE
//    size for every block under spark.shuffle.accurateBlockThreshold
//    (100 MB) -- at 4096 reducers every partition reported the same
//    77 KB and the skew detector saw a perfectly flat distribution.
//  - skew threshold/advisory 160k, factor 2: sized to the measured
//    161 KB median / 376 KB hot. Production keeps the 256 MB default --
//    production skew is GBs; the probe family is sized to keep the
//    C(20k,2) pair output affordable.
//  - coalescePartitions OFF: local[32] parallelism-first coalescing
//    targets totalBytes/32 (~12 MB here), which would fold the hot
//    reducer into a multi-reducer group (ineligible for splitting) and
//    fold upstream stages to few maps (no map ranges to split by). On a
//    1000-executor cluster the parallelism term keeps the target near
//    the advisory size and this interplay disappears.
// Run: /opt/spark/bin/spark-shell --master local[32] --driver-memory 64g \
//        --driver-class-path target/scala-2.13/classes -I tools/skew_probe.scala
import org.apache.spark.sql.functions._

graft.GraftSession.tune(spark)

val sf10 = "/root/repo/target/sf10"
// single-line chain: under spark-shell -I/-i the REPL evaluates each
// syntactically complete line, so a chain broken before .select would
// bind the FULL schema and unionByName below would fail on it
val base = spark.read.parquet(s"$sf10/documents.parquet").select("doc_id", "text")

val common = (0 until 40).map(j => s"boiler$j").mkString(" ")
val family = spark.range(20000).select(
  (col("id") + 900000000L).as("doc_id"),
  concat(lit(common + " "), concat(lit("x"), col("id"))).as("text"))
val corpus = base.unionByName(family)

spark.conf.set("spark.sql.shuffle.partitions", "2000")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "160k")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "160k")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

def run(skewOn: Boolean): Unit = {
  spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
  val t0 = System.nanoTime()
  val pairs = graft.llm.Dedup.minhashBandedPairs(corpus)
  val n = pairs.queryExecution.toRdd.count()
  val sec = (System.nanoTime() - t0) / 1e9
  val (skewJoins, splits) = graft.ops.PlanShape.skewJoinStats(pairs)
  println(f"PROBE skewOn=$skewOn pairs=$n wall=$sec%.1f s skewJoins=$skewJoins partialSplits=$splits")
}

// discarded warmup first: the first pass pays cold page cache + JIT
// (measured 1.5x on otherwise identical passes), which would otherwise
// masquerade as the split's benefit
run(skewOn = false)
run(skewOn = false)
run(skewOn = true)
System.exit(0)
