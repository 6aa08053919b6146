package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the portable 60-bit md5 fingerprint —
  * bit-identical to the composed
  * `conv(substring(md5(cast(key as binary)), 1, 15), 16, 10)
  * .cast("long")` (and DuckDB's
  * `CAST('0x' || substr(md5(k), 1, 15) AS BIGINT)`), fused to skip the
  * hex materialization + base-16 re-parse. This is the recipe behind
  * shingle fingerprints (the PPJoin set elements), simhash token
  * hashes, table checksums, and the HLL bucket/rank split
  * ([[HyperLogLogAgg.bucketRho]] extracts the same 60 bits in the
  * aggregator JVM path) — the hottest per-row map work in the near-dup
  * stack, which is exactly what survives a 100 TB fan-out.
  *
  * Generated code makes ONE static call; the digest instance is
  * thread-local.
  */
case class HashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hash_fp60 requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hash_fp60"

  override def nullSafeEval(a: Any): Any =
    HashFingerprint.fingerprint(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HashFingerprint.fingerprint($a)")

  override protected def withNewChildInternal(
      newChild: Expression): HashFingerprint = copy(child = newChild)
}

object HashFingerprint {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HashFingerprint].getName, "hash_fp60")

  private val tlMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of the digest = bytes 0-6 plus the high nibble
    * of byte 7 — 60 bits, always non-negative.
    */
  def fingerprint(key: UTF8String): Long = {
    val md = tlMd5.get()
    md.reset()
    val d = md.digest(key.getBytes)
    var x = 0L
    var i = 0
    while (i < 7) { x = (x << 8) | (d(i) & 0xffL); i += 1 }
    (x << 4) | ((d(7) & 0xf0L) >> 4)
  }
}
