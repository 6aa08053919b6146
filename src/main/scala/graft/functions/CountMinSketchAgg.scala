package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch over a string key column, as a typed
  * [[Aggregator]] — the custom-aggregation tier of the engine's
  * extension surface (buffer = one `depth × width` counter array,
  * merged element-wise, so partial aggregation and AQE work exactly as
  * for any algebraic aggregate).
  *
  * Hashing is the engine's PORTABLE md5 family (`md5("i:" ++ key)`,
  * first 7 hex chars as a 28-bit int, mod `width`) — bit-identical to
  * the SQL spelling used by expressions and the DuckDB oracle, so a
  * sketch built by this aggregator can be probed (and verified) from
  * plain SQL. Estimate for a key = min over rows of its counter; always
  * an overestimate, never under (the CMS guarantee).
  */
final class CountMinSketchAgg(val depth: Int, val width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + CountMinSketchAgg.cell(i, key, width)) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMinSketchAgg {

  /** Row `i`'s counter index for `key`: the 28-bit md5 prefix of
    * "i:key", mod width — the same arithmetic as
    * `CAST('0x'||substr(md5(i||':'||key),1,7) AS BIGINT) % width` in
    * DuckDB and `conv(substring(md5(..),1,7),16,10) % width` in Spark
    * SQL.
    */
  def cell(i: Int, key: String, width: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$key".getBytes("UTF-8"))
    // first 7 hex chars = 28 bits: 3.5 bytes, big-endian
    val x = ((digest(0) & 0xffL) << 20) | ((digest(1) & 0xffL) << 12) |
      ((digest(2) & 0xffL) << 4) | ((digest(3) & 0xf0L) >> 4)
    (x % width).toInt
  }
}
