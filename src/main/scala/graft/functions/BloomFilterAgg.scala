package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter over a string key column as a typed [[Aggregator]]:
  * buffer = `nBits/64` longs merged by bitwise OR, so partial
  * aggregation builds per-partition filters that union for free — the
  * shape that lets a 100 TB corpus test membership against a blocklist
  * with ONE broadcast bit array instead of a global join shuffle
  * (no false negatives; false positives re-checked exactly downstream,
  * see `Dedup.decontaminateBloom`).
  *
  * The `k` bit positions per key come from the engine's portable
  * Kirsch–Mitzenmacher md5 pair ([[CountMinSketchAgg.hashPair]]):
  * `pos_i = (h1 + i·h2) mod nBits`. Same spelling in Spark SQL and
  * DuckDB, so a filter built here is probeable (and auditable) from
  * plain SQL — [[BloomFilterAgg.mayContain]] is that probe as a Column.
  */
final class BloomFilterAgg(val nBits: Int, val k: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(nBits % 64 == 0, "nBits must be a multiple of 64")

  override def zero: Array[Long] = new Array[Long](nBits / 64)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    val (h1, h2) = CountMinSketchAgg.hashPair(key)
    var i = 0
    while (i < k) {
      val pos = ((h1 + i.toLong * h2) % nBits).toInt
      buf(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BloomFilterAgg {

  /** Membership probe of `key` against a filter column (the aggregator's
    * `array<bigint>` output): true iff all `k` positions are set. The
    * same arithmetic as the JVM build path, expressed over columns so
    * the probe runs map-side inside codegen.
    */
  def mayContain(filter: Column, key: Column, nBits: Int, k: Int): Column = {
    val (h1, h2) = CountMinSketchAgg.hashPairCols(key)
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(nBits.toLong))
      val word = element_at(filter, shiftright(pos, 6).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }
}
