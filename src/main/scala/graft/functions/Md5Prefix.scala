package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native `md5`-prefix hash: the first `nHex` hex digits of
  * `md5(input)` as an unsigned BIGINT — bit-for-bit the portable SQL
  * chain `CAST(conv(substr(md5(s), 1, nHex), 16, 10) AS BIGINT)` the
  * DuckDB oracle runs, without materializing the 32-char hex string and
  * re-parsing it (digest → long directly, one thread-local digest
  * instance). This chain runs once per (document, shingle) across the
  * whole dedup family (q37/q38/q39/q62 via `Dedup.hashedShingles`,
  * q40 per token), so it is the hottest scalar in the engine.
  *
  * `nHex` ≤ 15 keeps the value below 2⁶⁰ (non-negative long).
  */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")
    else if (nHex < 1 || nHex > 15)
      TypeCheckResult.TypeCheckFailure(s"$prettyName nHex must be in [1, 15], got $nHex")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    Md5PrefixLong.hash(s.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5PrefixLong.hash($c, $nHex)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5PrefixLong {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First `nHex` hex digits (= top 4·nHex bits, big-endian) of the md5
    * digest, as a long. Shared by interpreted eval and codegen.
    */
  def hash(s: UTF8String, nHex: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < nHex) {
      val nibble =
        if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xF
        else d(i >> 1) & 0xF
      acc = (acc << 4) | nibble
      i += 1
    }
    acc
  }
}
