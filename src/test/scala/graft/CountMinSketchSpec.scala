package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinSketchAgg

/** Count-Min sketch aggregator: the JVM hash matches the SQL spelling
  * bit for bit, and estimates obey the CMS overestimate guarantee.
  */
class CountMinSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("JVM cell hash equals the portable SQL hash for arbitrary keys") {
    import spark.implicits._
    val keys = Seq("view", "purchase", "error", "x", "", "späßchen", "0:tricky")
    val rows = for (i <- 0 until 4; k <- keys) yield (i, k)
    val df = rows.toDF("i", "k")
    val (h1, h2) = CountMinSketchAgg.hashPairCols(col("k"))
    val sqlCell = pmod(h1 + col("i").cast("long") * h2, lit(64L))
    val got = df.select(col("i"), col("k"), sqlCell.as("cell")).collect()
    got.foreach { r =>
      assert(r.getLong(2) ===
        CountMinSketchAgg.cell(r.getInt(0), r.getString(1), 64).toLong,
        s"mismatch for i=${r.getInt(0)} k=${r.getString(1)}")
    }
  }

  test("estimates are never below true counts and exact without collisions") {
    import spark.implicits._
    val data = Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c")
    val cms = new CountMinSketchAgg(4, 64)
    val sketch: Seq[Long] = data.toDF("k").as[String]
      .select(cms.toColumn.name("s")).collect().head
    def est(k: String): Long =
      (0 until 4).map(i => sketch(i * 64 + CountMinSketchAgg.cell(i, k, 64))).min
    assert(est("a") >= 100 && est("b") >= 10 && est("c") >= 1)
    // 3 keys in 64 cells over 4 independent rows: min() sheds collisions
    assert(est("a") === 100 && est("b") === 10 && est("c") === 1)
  }
}
