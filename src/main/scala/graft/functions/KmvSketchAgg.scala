package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002;
  * Beyer et al., SIGMOD 2007 — the theta-sketch ancestor), as a typed
  * [[Aggregator]]: the buffer is the `k` SMALLEST DISTINCT 60-bit md5
  * fingerprints seen, kept sorted ascending. Its defining property over
  * the engine's other sketches (reference scope: the funnel pipeline's
  * GROUP-BY-count reports generalized to bounded-memory forms): two
  * sketches support SET ALGEBRA — union (merge the lists, keep the k
  * smallest) and, unlike HLL, INTERSECTION: the k-min union sample is a
  * uniform sample of the union's hash space below θ = kth value, so the
  * fraction of it present in both sketches estimates the Jaccard
  * coefficient and θ scales it to an intersection cardinality.
  *
  * The whole state is DETERMINISTIC — "k smallest distinct hashes of
  * the key set" does not depend on arrival order, partial-aggregation
  * split, or merge tree (strictly stronger than Misra–Gries, whose
  * counter values are order-dependent on the eviction path) — and the
  * hash is the engine's portable md5 family
  * (`CAST('0x' || substr(md5(k), 1, 15) AS BIGINT)`), so a relational
  * oracle rebuilds the exact sketch with one window function. Estimates
  * stay in-plan over exact-integer witnesses: θ is a long, the top-k
  * intersection count is a long, and the only float ops are one
  * long→double cast and one divide per estimate.
  *
  * At 100 TB: per-segment sketches are k longs; "how many users do
  * segments A and B share" merges two k-long arrays instead of
  * re-shuffling the key column for an exact distinct-intersect.
  */
final class KmvSketchAgg(val k: Int)
    extends Aggregator[String, Seq[Long], Seq[Long]] {

  require(k > 0, "k must be positive")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], key: String): Seq[Long] = {
    // NULL keys are ignored, matching countDistinct's NULL semantics
    // (and the oracle's md5(NULL) = NULL row, which never enters the
    // k-min window) — without this a single null key NPEs the job
    if (key == null) return buf
    val fp = KmvSketchAgg.fingerprint60(key)
    // steady-state fast path: once the buffer is full, most arrivals
    // hash above θ (= buf.last) and return without allocation
    if (buf.length == k && fp >= buf.last) buf
    else {
      val arr = buf.toArray
      val idx = java.util.Arrays.binarySearch(arr, fp)
      if (idx >= 0) buf // already present (distinct semantics)
      else {
        val ins = -idx - 1
        val outLen = math.min(k, arr.length + 1)
        val out = new Array[Long](outLen)
        System.arraycopy(arr, 0, out, 0, ins)
        out(ins) = fp
        val tail = outLen - ins - 1
        if (tail > 0) System.arraycopy(arr, ins, out, ins + 1, tail)
        out.toVector
      }
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    // both sides sorted distinct; the merged k-min is again "k smallest
    // distinct of the union" — the algebraic-merge identity that makes
    // every aggregation tree produce the same sketch
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object KmvSketchAgg {

  private val tlMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(key) — bit-identical to the engine's
    * [[HashFingerprint]] expression and to the SQL spelling
    * `CAST('0x' || substr(md5(k), 1, 15) AS BIGINT)` (same byte math as
    * [[HyperLogLogAgg.bucketRho]], without the bucket split).
    */
  def fingerprint60(key: String): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(key.getBytes("UTF-8"))
    var x = 0L
    var i = 0
    while (i < 7) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    (x << 4) | ((d(7) & 0xf0L) >> 4)
  }
}
