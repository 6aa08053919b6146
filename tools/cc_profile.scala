// Profile dupClusters at 10x: per-phase and per-iteration timings.
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

val s = graft.GraftSession.tune(spark)
val docs = s.read.parquet("/tmp/graft_scale10/documents.parquet")

def t[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
}

val pairs = t("banded_pairs materialize") {
  val p = graft.llm.Dedup.minhashBandedPairs(docs)
    .persist(StorageLevel.MEMORY_AND_DISK)
  p.count(); p
}

val fwd = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
val edges = fwd
  .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
  .persist(StorageLevel.MEMORY_AND_DISK)
t("edges count")(edges.count())

var labels = t("init labels") {
  edges.select(col("src").as("id")).distinct()
    .select(col("id"), col("id").as("cluster"))
    .localCheckpoint(true)
}
var converged = false
var iter = 0
while (!converged && iter < 25) {
  val nbrMin = edges
    .join(labels.select(col("id").as("nid"), col("cluster").as("ncl")),
      col("dst") === col("nid"))
    .groupBy(col("src")).agg(min("ncl").as("nbr_min"))
  val stepped = labels
    .join(nbrMin, labels("id") === nbrMin("src"), "left")
    .select(labels("id"),
      least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
        .as("cluster"))
  val jumped = t(s"iter $iter jump+ckpt") {
    stepped.as("x")
      .join(
        stepped.select(col("id").as("pid"), col("cluster").as("pcl")).as("p"),
        col("x.cluster") === col("p.pid"), "left")
      .select(col("x.id").as("id"),
        least(col("x.cluster"), coalesce(col("pcl"), col("x.cluster")))
          .as("cluster"))
      .localCheckpoint(true)
  }
  converged = t(s"iter $iter conv check") {
    jumped
      .join(labels.select(col("id").as("oid"), col("cluster").as("old")),
        col("id") === col("oid"))
      .filter(col("cluster") =!= col("old"))
      .isEmpty
  }
  labels = jumped
  iter += 1
}
println(s"PROF iterations=$iter")
t("final orderBy collect") {
  labels.select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
    .orderBy("doc_id").count()
}
System.exit(0)
