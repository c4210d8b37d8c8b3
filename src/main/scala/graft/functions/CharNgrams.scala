package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string, in order — value-identical to
  * `transform(sequence(1, length(s) - n + 1), i -> substring(s, i, n))`
  * (codepoint-indexed, like SQL substring), but one O(len) pass instead
  * of O(len²): each `substring(s, i, …)` call walks the UTF-8 bytes
  * from the start to find the i-th codepoint, so the transform
  * formulation re-scans the prefix for every position — the dominant
  * cost of the trigram language-model queries (q130's profile). Here
  * the codepoint byte-offsets are computed once and each n-gram is a
  * byte-range slice.
  *
  * Strings shorter than n codepoints yield an empty array (the callers'
  * `length ≥ n` filter makes this unreachable, but the total function
  * keeps the expression usable unguarded).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")
    else if (n < 2 || n > 8)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires n in [2, 8], got n=$n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    CharNgrams.ngrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharNgrams.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  /** One pass: codepoint byte-offsets, then n-gram byte slices. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val numChars = s.numChars()
    val out = numChars - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = s.getBytes
    val offsets = new Array[Int](numChars + 1)
    var ci = 0
    var off = 0
    while (ci < numChars) {
      offsets(ci) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      ci += 1
    }
    offsets(numChars) = bytes.length
    val arr = new Array[Any](out)
    var i = 0
    while (i < out) {
      arr(i) = UTF8String.fromBytes(bytes, offsets(i), offsets(i + n) - offsets(i))
      i += 1
    }
    new GenericArrayData(arr)
  }
}
