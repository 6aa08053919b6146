package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity
import graft.ops.Skew

/** Salted aggregation correctness on a skewed fixture (one key carries
  * 90% of rows), plus IVF ANN sanity against the exact scan.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private lazy val skewed = {
    import spark.implicits._
    // hot key "h": 900 rows; 10 cold keys: 10 rows each
    ((1 to 900).map(i => ("h", i.toLong)) ++
      (1 to 100).map(i => (s"c${i % 10}", i.toLong))).toDF("k", "v")
  }

  test("saltedSum equals plain groupBy sum on skewed keys") {
    val plain = skewed.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedCount equals plain count") {
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("h") === 900L)
  }

  test("twoPhaseCountDistinct equals countDistinct") {
    val plain = skewed.groupBy("k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.twoPhaseCountDistinct(skewed, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("IVF ANN probes a strict candidate subset and overlaps the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = Similarity.ivfTopK(emb, 0L, 10, nlist = 16, nprobe = 4)
      .collect().map(_.getLong(0))
    assert(ivf.length === 10)
    assert(ivf.distinct.length === 10)
    val exact = Similarity.cosineTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    // random embeddings give clusters little structure; still, probing a
    // quarter of the cells should recover part of the true top-10
    assert(ivf.count(exact.contains) >= 2, s"ivf=${ivf.toSeq} exact=$exact")
    // determinism
    val again = Similarity.ivfTopK(emb, 0L, 10, nlist = 16, nprobe = 4)
      .collect().map(_.getLong(0))
    assert(again.toSeq === ivf.toSeq)
  }

  test("flat-quantizer IVF with a full probe equals exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // nprobe = nlist ⇒ every cell scanned ⇒ candidate set = whole corpus
    val full = Similarity.ivfFlatTopK(emb, 0L, 10, nlist = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq === exact.toSeq)
    // a partial probe returns a subset of the corpus, still k deep
    val part = Similarity.ivfFlatTopK(emb, 0L, 10, nlist = 8, nprobe = 2)
      .collect().map(_.getLong(0))
    assert(part.length === 10 && part.distinct.length === 10)
  }
}
