// Round-16 warm A/B for the exact-scan block-schedule crossover.
// The exact_legs_probe_r16 run measured the forced 10-leg union 1.76x
// FASTER than the unsharded scan at sf10 (200k vectors, 2e10 pairs),
// but the single-scan number ran first in the JVM and absorbed JIT
// warm-up, and the r15 calibration (different leg spellings) had
// measured blocked slower — so defaultLegPairs stayed 2^35 pending a
// warm comparison. This probe alternates S,B,S,B in one JVM and
// compares the WARM pair (S2 vs B2): if the blocked plan still wins
// warm, the crossover is real occupancy (not JIT) and defaultLegPairs
// moves down so real corpora block before 2e10 pairs.
//
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.network.timeout=600s \
//     --jars target/scala-2.13/funnelreportetlpipelinespark_2.13-0.1.0.jar \
//     -I tools/exact_legs_warm_ab_r16.scala
import org.apache.spark.sql.functions._
import graft.llm.Similarity

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.ansi.enabled", "false")
spark.conf.set("spark.sql.session.timeZone", "UTC")

val emb = spark.read.parquet("/root/repo/target/sf10/embeddings.parquet")
val n = emb.count()
println(s"vectors=$n pairs=${BigInt(n) * (n - 1) / 2}")

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

def single() = sig(Similarity.exactCosinePairs(emb, 0.4))
def blocked() = sig(Similarity.exactCosinePairsBudgeted(emb, 0.4,
  maxLegPairs = 1L << 32, nRows = Some(n)))

val s1 = time("single_cold")(single())
val b1 = time("blocked_warmish")(blocked())
val s2 = time("single_warm")(single())
val b2 = time("blocked_warm")(blocked())
assert(s1 == b1 && b1 == s2 && s2 == b2, "signatures diverged")
println(s"signature=$s1 (all four equal)")
println("VERDICT: compare wall[single_warm] vs wall[blocked_warm]")
System.exit(0)
