package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: THE portable 28-bit md5 hash bucket —
  * bit-identical to the composed spelling
  * `pmod(conv(substring(md5(cast(key as binary)), 1, 7), 16, 10), m)`
  * (and to the DuckDB oracle's
  * `CAST('0x' || substr(md5(k), 1, 7) AS BIGINT) % m`), but fused: the
  * composed chain materializes the full 32-char hex string, substrings
  * it, and re-parses base-16 per row; this takes the first 28 BITS
  * straight off the digest bytes. Every bucket-derived decision (split
  * assignment, mixture/stratified sampling, bootstrap resampling,
  * weighted sampling, the inverted-index partition key) funnels through
  * [[graft.llm.Dedup.hashBucket]], so the fusion pays at every call
  * site; per-row cost is what survives a 100 TB fan-out.
  *
  * Generated code makes ONE static call (no boxing, stays inside
  * whole-stage codegen). The digest instance is thread-local — codegen
  * evaluates within a thread, never across.
  */
case class HashBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hash_bucket requires (string, bigint) arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hash_bucket"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashBucket.bucket(a.asInstanceOf[UTF8String], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashBucket.bucket($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashBucket =
    copy(left = newLeft, right = newRight)
}

object HashBucket {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HashBucket].getName, "hash_bucket")

  private val tlMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by eval and generated code. The first 7
    * hex chars of the digest are bytes 0-2 plus the high nibble of
    * byte 3 — 28 bits; the non-negative remainder matches `pmod` (and
    * DuckDB `%` on the non-negative left operand).
    */
  def bucket(key: UTF8String, modulus: Long): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(key.getBytes)
    val x = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
    x % modulus
  }
}
