// Round-12 scaling soak data: a 100x replica of sf0.1 under
// /root/repo/target/sf10, for the linearity probe of the 10 heaviest
// queries (VERDICT r11 item 3). NOT correctness input — the driver's
// oracle runs only on /root/testdata.
//
// Same construction rules as tools/sf1_gen.scala (disjoint key ranges
// per replica, dims copied as-is, replica-salted document tokens), with
// one change forced by R=100: the embeddings' per-replica dimension
// ROTATION repeats mod 64, so replicas 64..99 would be perfectly
// correlated twins of 0..35 and the cross-replica pair count would
// explode quadratically. A SIGNED permutation fixes it: replicas >= 64
// additionally negate the odd coordinates. Within a replica every
// pairwise dot product is exactly invariant (the common sign vector
// squares away), so per-replica ANN/near-dup structure still matches
// sf0.1 bit-for-bit, while all 100 (rotation, sign) combinations are
// distinct.
// Run: spark-shell --master local[32] -I tools/sf10_gen.scala
import org.apache.spark.sql.functions._

val src = "/root/testdata/sf0.1"
val out = "/root/repo/target/sf10"
val R = 100

def rep(table: String)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
  val base = spark.read.parquet(s"$src/$table.parquet")
  val all = (0 until R).map(i => f(base, i)).reduce(_ unionByName _)
  all.repartition(256).write.mode("overwrite").parquet(s"$out/$table.parquet")
  println(s"GEN $table: ${spark.read.parquet(s"$out/$table.parquet").count()}")
}

// single-line loop body: under spark-shell -I the REPL evaluates each
// syntactically complete line, so a chain broken after .mode(...) runs
// the prefix and silently drops the trailing .parquet(...) call (the
// round-13 regeneration shipped without dims until copied by hand)
for (t <- Seq("region", "nation", "customer", "supplier", "part")) { spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet"); println(s"GEN dim $t") }

val OK = 10000000L // > max o_orderkey at sf0.1
val PK = 1000000L
val EID = 10000000L
val UID = 1000000L
val DID = 1000000L

rep("lineitem") { (df, i) =>
  df.withColumn("l_orderkey", col("l_orderkey") + lit(i * OK))
    .withColumn("l_partkey", col("l_partkey") + lit(i * PK))
}
rep("orders") { (df, i) =>
  df.withColumn("o_orderkey", col("o_orderkey") + lit(i * OK))
}
rep("events") { (df, i) =>
  df.withColumn("event_id", col("event_id") + lit(i * EID))
    .withColumn("user_id", col("user_id") + lit(i * UID))
}
rep("embeddings") { (df, i) =>
  val rot = (7 * i) % 64
  val emb =
    if (i == 0) col("embedding")
    else if (i < 64)
      expr(s"transform(sequence(0, 63), j -> embedding[int((j + $rot) % 64)])")
    else
      expr(s"transform(sequence(0, 63), j -> IF(j % 2 = 1," +
        s" -embedding[int((j + $rot) % 64)]," +
        s"  embedding[int((j + $rot) % 64)]))")
  df.withColumn("vec_id", col("vec_id") + lit(i * 100000L))
    .withColumn("embedding", emb)
}
rep("documents") { (df, i) =>
  val txt =
    if (i == 0) col("text")
    else expr(s"array_join(transform(split(text, '\\\\s+'), " +
      s"w -> substr(md5(concat(w, '$i')), 1, greatest(1, least(length(w), 32)))), ' ')")
  df.withColumn("doc_id", col("doc_id") + lit(i * DID))
    .withColumn("text", txt)
    .withColumn("n_chars", length(col("text")).cast("long"))
}
println("GEN done")
System.exit(0)
