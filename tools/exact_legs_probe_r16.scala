// Round-16 probe (VERDICT item 6): the budgeted exact cosine scan's
// multi-leg path at REAL scale — sf10's 200k vectors (2e10 pairs),
// with a leg bound forcing the block schedule (maxLegPairs = 2^32 ->
// B = ceil(200000/65536) = 4 blocks -> 10 legs), committed as per-leg
// wall times plus a pair-set hash identity against the single-leg scan.
// The r15 identity proof was unit-test-sized; this run actually crosses
// the leg bound on a real corpus.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.network.timeout=600s \
//     --jars target/scala-2.13/funnelreportetlpipelinespark_2.13-0.1.0.jar \
//     -I tools/exact_legs_probe_r16.scala
import org.apache.spark.sql.functions._
import graft.llm.Similarity

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.ansi.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")

val emb = spark.read.parquet("/root/repo/target/sf10/embeddings.parquet")
val n = emb.count()
println(s"vectors=$n pairs=${BigInt(n) * (n - 1) / 2}")

// (count, hash) signature of a pair set; sum(xxhash64) is additive over
// the disjoint legs, so per-leg signatures sum to the full scan's
def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = df.agg(count(lit(1)),
    coalesce(sum(xxhash64(col("vec_a"), col("vec_b"), col("cos"))),
      lit(0L))).collect()(0)
  (r.getLong(0), r.getLong(1))
}
def time[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"== wall[$tag] ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
}

val single = time("single_leg_full_scan")(
  sig(Similarity.exactCosinePairs(emb, 0.4)))
println(s"single=$single")

// budgeted path with the leg bound LOWERED so this corpus crosses it:
// one unioned plan over the 10-leg block schedule
val budgeted = time("budgeted_forced_10leg_union")(
  sig(Similarity.exactCosinePairsBudgeted(emb, 0.4,
    maxLegPairs = 1L << 32, nRows = Some(n))))
println(s"budgeted=$budgeted")
assert(budgeted == single, "budgeted union diverged from the single leg")

// the restartable-jobs schedule: each leg as its own job, timed
val legs = Similarity.exactCosinePairsLegs(emb, 0.4, 4)
println(s"legs=${legs.size}")
var cnt = 0L; var hash = 0L
legs.zipWithIndex.foreach { case (leg, i) =>
  val s = time(f"leg_$i%02d")(sig(leg))
  println(s"  leg_$i = $s")
  cnt += s._1; hash += s._2
}
println(s"legsum=($cnt,$hash)")
assert((cnt, hash) == single, "leg-by-leg union diverged from the single leg")
println("EQUALITY OK")
System.exit(0)
