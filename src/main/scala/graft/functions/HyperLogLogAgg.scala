package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) as a
  * typed [[Aggregator]] — 64 single-byte-scale registers merged by
  * element-wise max, so partial aggregation, AQE, and cross-partition
  * merge all behave like any algebraic aggregate, and sketches for
  * different partitions/days can be unioned and re-merged for free
  * (the property that matters at 100 TB: count-distinct without a
  * global shuffle of the key column).
  *
  * The hash is the engine's PORTABLE md5 family, so the register state
  * is engine-independent and the DuckDB oracle can rebuild it
  * relationally: `x` = first 60 bits of md5(key) (15 hex chars),
  * bucket = `x mod 64`, and the rank is `55 - bitlength(x div 64)`
  * (the 54-bit remainder's leading-zero count + 1; all-zero → 55).
  * Estimation is [[HyperLogLogAgg.estimate]], kept IN-PLAN so the same
  * arithmetic is expressible over the oracle's rebuilt registers.
  */
final class HyperLogLogAgg extends Aggregator[String, Array[Int], Seq[Int]] {

  override def zero: Array[Int] = new Array[Int](HyperLogLogAgg.m)

  override def reduce(buf: Array[Int], key: String): Array[Int] = {
    val (bucket, rho) = HyperLogLogAgg.bucketRho(key)
    if (rho > buf(bucket)) buf(bucket) = rho
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
}

object HyperLogLogAgg {

  /** Register count (p = 6). Fixed so the SQL spellings stay literal. */
  val m: Int = 64

  /** alpha_64 · m² — the standard bias constant for m = 64. Spelled as
    * `0.709 * 4096` in SQL; the product is an exact power-of-two
    * scaling of the parsed decimal, so both engines hold the same
    * double.
    */
  val alphaM2: Double = 0.709 * 4096

  private val tlMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** (bucket, rank) of a key: bucket = low 6 bits of the 60-bit md5
    * prefix, rank = 55 − bitlength(remaining 54 bits). Same arithmetic
    * as the SQL `x = CAST('0x'||substr(md5(k),1,15) AS BIGINT)`,
    * `bucket = x % 64`, `rank = 55 - bitlength(x // 64)`.
    */
  def bucketRho(key: String): (Int, Int) = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(key.getBytes("UTF-8"))
    // first 15 hex chars = bytes 0-6 + high nibble of byte 7 (60 bits)
    var x = 0L
    var i = 0
    while (i < 7) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    x = (x << 4) | ((d(7) & 0xf0L) >> 4)
    val bucket = (x % 64).toInt
    val w = x >>> 6
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w)
    (bucket, 55 - bitlen)
  }

  /** HLL estimate from a register array column, as a Column — the whole
    * computation stays deterministic across engines:
    *  - the harmonic sum is computed in INTEGER arithmetic,
    *    `S = Σ 2^(55−reg)` (≤ 64·2^55 < 2^63, exact, order-independent),
    *    so the only roundings are one BIGINT→DOUBLE cast and one
    *    division — identical in any IEEE engine;
    *  - raw = alpha·m²·2^55 / S (the 2^55 factor is exact scaling);
    *  - small-range linear counting (raw ≤ 2.5m with empty buckets):
    *    m·ln(m/V) — the one libm call, absorbed by bround(…, 4).
    */
  def estimate(regs: Column): Column = {
    val s = regWeight(regs)
    val zeros = zeroRegs(regs)
    val raw = lit(alphaM2) * pow(lit(2.0), lit(55)) / s.cast("double")
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    bround(est, 4)
  }

  /** The exact-integer witnesses of the register state, for the oracle's
    * strong (FP-free) compare: the harmonic weight `S` and the empty
    * count `V`.
    */
  def regWeight(regs: Column): Column =
    aggregate(regs, lit(0L),
      // shiftleft via call_function: the Scala DSL overload only takes a
      // literal shift amount, the SQL function accepts a column
      (acc, r) => acc + call_function("shiftleft", lit(1L), lit(55) - r))

  def zeroRegs(regs: Column): Column =
    aggregate(regs, lit(0), (acc, r) => acc + when(r === 0, 1).otherwise(0))
}
