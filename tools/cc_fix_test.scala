// Hypothesis test: persist-vs-localCheckpoint materialization of the
// banded-pairs plan at 10x.
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

val s = graft.GraftSession.tune(spark)
val docs = s.read.parquet("/tmp/graft_scale10/documents.parquet")

def t[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
}

t("pairs plain count (AQE)") {
  graft.llm.Dedup.minhashBandedPairs(docs).count()
}
t("pairs localCheckpoint(true)") {
  graft.llm.Dedup.minhashBandedPairs(docs)
    .select("doc_a", "doc_b").localCheckpoint(true).count()
}
t("pairs persist+count") {
  val p = graft.llm.Dedup.minhashBandedPairs(docs)
    .persist(StorageLevel.MEMORY_AND_DISK)
  val n = p.count(); p.unpersist(); n
}
System.exit(0)
