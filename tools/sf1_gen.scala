// Round-11 scaling soak data: a 10x replica of sf0.1 under
// /root/repo/target/sf1, for the linearity probe of the heaviest
// queries (VERDICT r10 item 2). NOT correctness input — the driver's
// oracle runs only on /root/testdata.
//
// Construction keeps per-replica structure identical to sf0.1 so the
// expected cost curve is linear:
//  - facts (lineitem/orders/events/documents) replicate 10x with
//    disjoint key ranges (orderkey/partkey/doc_id/event_id/user_id
//    shifted per replica); dims copy as-is (dims grow slower than
//    facts in any real warehouse);
//  - document TEXT for replicas 1..9 maps each whitespace token
//    through a replica-salted md5 prefix: within-replica dup/near-dup
//    structure is preserved exactly, while cross-replica vocabularies
//    are disjoint — so shingle/minhash/substring pair outputs scale
//    ~10x instead of quadratically in the replica count (identical
//    texts across replicas would otherwise all pair with each other).
// Run: spark-shell --master local[32] -I tools/sf1_gen.scala
import org.apache.spark.sql.functions._

val src = "/root/testdata/sf0.1"
val out = "/root/repo/target/sf1"
val R = 10

def rep(table: String)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
  val base = spark.read.parquet(s"$src/$table.parquet")
  val all = (0 until R).map(i => f(base, i)).reduce(_ unionByName _)
  all.repartition(64).write.mode("overwrite").parquet(s"$out/$table.parquet")
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
  // per-replica dimension ROTATION: a common permutation leaves every
  // within-replica pairwise cosine EXACTLY invariant (per-replica
  // near-dup/ANN structure matches sf0.1 bit-for-bit), while
  // cross-replica pairs decorrelate — near-dup pair outputs scale
  // ~10x, not quadratically in the replica count. Verbatim copies
  // would give every vector 9 identical twins (45 self-pairs each, a
  // ~100x pair explosion): that benches the fixture, not the engine —
  // the embedding-space analogue of documents' replica-salted tokens.
  val emb =
    if (i == 0) col("embedding")
    else expr(s"transform(sequence(0, 63), j -> embedding[int((j + ${7 * i}) % 64)])")
  df.withColumn("vec_id", col("vec_id") + lit(i * 100000L))
    .withColumn("embedding", emb)
}
rep("documents") { (df, i) =>
  // LENGTH-PRESERVING token salt (each token maps to an md5 prefix of
  // its own length, capped at the 32 hex chars md5 yields): the fixed
  // 8-char prefix of the first cut inflated average text length
  // 297 → 467 chars, over-costing every length-quadratic verifier
  // (levenshtein DP per candidate pair) by ~2.5× on replicas — a
  // fixture artifact, not engine cost. Same dedup/near-dup structure
  // either way (token identity is what matters).
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
