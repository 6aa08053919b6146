// 10x scale spot-check for the round-10 Insights batch.
// Run: spark-shell --driver-memory 16g --driver-class-path target/scala-2.13/classes -i tools/scale_check_r10.scala
// Same protocol as tools/scale_check.scala (sf0.1 replicated 10x with
// shifted ids into /tmp/graft_scale10_r10), except supplier ALSO
// replicates with the lineitem l_suppkey stride: tpch_q7_like joins
// l_suppkey against the supplier dim, so a 1x dim would silently drop
// 90% of the fact rows and fake a 10x speedup.
import org.apache.spark.sql.functions._

val s = graft.GraftSession.tune(spark)
val src = "/root/testdata/sf0.1"
val out = "/tmp/graft_scale10_r10"

def rep(name: String, idCols: Map[String, Long]): Unit = {
  val base = s.read.parquet(s"$src/$name.parquet")
  val parts = (0 until 10).map { i =>
    idCols.foldLeft(base) { case (df, (c, stride)) =>
      df.withColumn(c, col(c) + lit(i * stride))
    }
  }
  parts.reduce(_.unionByName(_)).write.mode("overwrite")
    .parquet(s"$out/$name.parquet")
}
rep("documents", Map("doc_id" -> 1000000L))
rep("events", Map("event_id" -> 10000000L, "user_id" -> 100000L))
rep("orders", Map("o_orderkey" -> 10000000L))
rep("lineitem", Map("l_orderkey" -> 10000000L,
                    "l_suppkey" -> 100000L, "l_partkey" -> 1000000L))
rep("supplier", Map("s_suppkey" -> 100000L))
for (t <- Seq("customer", "part", "nation", "region")) {
  s.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
    .parquet(s"$out/$t.parquet")
}
println(s"replicated 10x -> $out")

def time(name: String): Unit = {
  val q = graft.SparkEntry.queries(name)
  val t0 = System.nanoTime()
  val n = q(s, out).count()
  val sec = (System.nanoTime() - t0) / 1e9
  println(f"SCALE10 $name%-24s $sec%8.2f s  rows=$n")
}
time("dedup_exact") // JIT warmup on a cheap one
for (q <- Seq("funnel_conversion_time", "correlation_matrix",
              "connected_components", "readability_score",
              "tpch_q7_like")) time(q)
System.exit(0)
