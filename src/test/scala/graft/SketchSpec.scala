package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HilbertIndex, KmvSketchAgg, MisraGriesAgg}

/** Round-12 additions: the Misra–Gries guarantee on random orders and
  * partitionings (the regime the oracle CANNOT gate, because MG
  * counter values there are arrival-order-dependent), and the two
  * Hilbert-curve theorems that certify the layout expression really is
  * a Hilbert walk (a wrong rotation still bijects but breaks unit
  * steps — continuity is the discriminating property).
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def mgRun(agg: MisraGriesAgg, xs: Seq[String],
      pieces: Int): Map[String, Long] = {
    // random partition split + left-fold merge: any tree gives the bound
    val parts = xs.grouped(math.max(1, xs.size / pieces)).toSeq
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  test("misra-gries: two-sided bound and must-contain, random orders and merges") {
    val rng = new scala.util.Random(12001)
    for (trial <- 0 until 20) {
      val cap = 4 + rng.nextInt(12)
      // Zipf-ish stream over ~40 keys: heavy head, long tail
      val xs = rng.shuffle((0 until 40).flatMap { k =>
        Seq.fill(1 + 2000 / (1 + k * k))(s"k$k")
      })
      val n = xs.size.toLong
      val summary = mgRun(new MisraGriesAgg(cap), xs, 1 + rng.nextInt(7))
      val exact = MisraGriesAgg.exactCounts(xs)
      assert(summary.size <= cap, s"trial $trial: capacity violated")
      val slack = n / (cap + 1)
      summary.foreach { case (k, est) =>
        val t = exact(k)
        assert(est <= t, s"trial $trial: $k overestimated ($est > $t)")
        assert(est >= t - slack,
          s"trial $trial: $k below bound ($est < $t - $slack)")
      }
      exact.foreach { case (k, t) =>
        if (t > slack)
          assert(summary.contains(k),
            s"trial $trial: heavy key $k (count $t > n/(cap+1)=$slack) evicted")
      }
    }
  }

  test("misra-gries exact regime: partition-free equality to true counts") {
    import spark.implicits._
    val agg = new MisraGriesAgg(16)
    val xs = Seq.fill(100)("a") ++ Seq.fill(37)("b") ++ Seq.fill(5)("c") ++
      Seq("d")
    val got = spark.createDataset(xs).repartition(7)
      .select(agg.toColumn.name("s")).collect().head
    assert(got === MisraGriesAgg.exactCounts(xs))
  }

  test("hilbert: bijection and unit Manhattan steps on the full 16x16 grid") {
    val n = 16
    val cells = (0L until (n.toLong * n)).map(d => HilbertIndex.d2xy(n, d))
    assert(cells.distinct.size === n * n) // bijection
    cells.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps between ($x1,$y1) and ($x2,$y2)")
    }
    // the two walks invert each other
    for (x <- 0 until n; y <- 0 until n)
      assert(HilbertIndex.d2xy(n, HilbertIndex.xy2d(n, x, y)) === ((x, y)))
  }

  test("hilbert: the codegen'd expression equals the reference walk at full size") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(12002)
    val pts = Seq.fill(500)((rng.nextInt(65536).toLong,
      rng.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
    val hx = org.apache.spark.sql.graftbridge.GraftBridge.column(
      HilbertIndex(
        org.apache.spark.sql.graftbridge.GraftBridge.expression(col("x")),
        org.apache.spark.sql.graftbridge.GraftBridge.expression(col("y"))))
    val got = pts.toDF("x", "y").select(col("x"), col("y"), hx.as("d"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === HilbertIndex.compute(r.getLong(0), r.getLong(1)))
    }
    // distinct points land on distinct curve positions (smoke bijection)
    assert(got.map(_.getLong(2)).distinct.length === pts.distinct.length)
  }

  test("hilbert: SQL registration via GraftExtensions resolves") {
    val d = spark.sql("SELECT hilbert_index(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS d")
      .collect().head.getLong(0)
    assert(d === HilbertIndex.compute(3L, 5L))
  }

  private def kmvRun(agg: KmvSketchAgg, xs: Seq[String],
      pieces: Int): Seq[Long] = {
    val parts = xs.grouped(math.max(1, xs.size / pieces)).toSeq
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  test("kmv: sketch IS the k smallest distinct fingerprints, any order/split") {
    // determinism is the sketch's defining property: every arrival
    // order, partition split, and merge tree must yield the identical
    // state — which equals the brute-force k-min of the distinct set
    val rnd = new scala.util.Random(13)
    val agg = new KmvSketchAgg(16)
    val keys = Seq.tabulate(400)(i => s"k${rnd.nextInt(120)}_$i") ++
      Seq.tabulate(200)(i => s"dup${i % 25}") // repeats exercise distinctness
    val expected = keys.distinct
      .map(KmvSketchAgg.fingerprint60).distinct.sorted.take(16)
    for (seed <- 1 to 5) {
      val r = new scala.util.Random(seed)
      val got = kmvRun(agg, r.shuffle(keys), 1 + r.nextInt(7))
      assert(got === expected)
    }
  }

  test("kmv exact regime: fewer distinct keys than k keeps the whole set") {
    val agg = new KmvSketchAgg(64)
    val keys = (0 until 20).map(i => s"only$i")
    val got = kmvRun(agg, keys ++ keys, 3)
    assert(got === keys.map(KmvSketchAgg.fingerprint60).sorted)
    assert(got.length === 20) // u_size < k → estimates collapse to exact
  }

  test("kmv: union/intersection estimates bracket truth on a planted overlap") {
    // A = 0..999, B = 500..1499 → |A∪B| = 1500, |A∩B| = 500, J = 1/3.
    // KMV with k=64 has RSE ≈ 1/√(k−2) ≈ 12.7%; assert a generous 4σ.
    val k = 64
    val agg = new KmvSketchAgg(k)
    val a = kmvRun(agg, (0 until 1000).map(i => s"u$i"), 4)
    val b = kmvRun(agg, (500 until 1500).map(i => s"u$i"), 4)
    val u = (a ++ b).distinct.sorted.take(k)
    val theta = u.last
    val interTopK = a.toSet.intersect(b.toSet).count(_ <= theta)
    val unionEst = (k - 1).toDouble * math.pow(2.0, 60) / theta.toDouble
    val interEst = interTopK.toDouble / u.size * unionEst
    assert(math.abs(unionEst - 1500.0) <= 4 * 0.127 * 1500.0)
    assert(math.abs(interEst - 500.0) <= 4 * 0.30 * 500.0)
  }
}
