package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * hash every character k-gram with a polynomial ROLLING hash (one mult +
  * one add per character, not per k-gram), then keep the minimum hash of
  * each w-window of consecutive k-gram hashes — the classic guarantee
  * that any shared substring of length ≥ k+w-1 contributes at least one
  * shared fingerprint, at ~1/w the density of the full hash sequence.
  *
  * Returns the SORTED DISTINCT fingerprint array. All arithmetic is
  * exact integer math mod 2³¹-1 over Unicode code points, so the value
  * is bit-identical to the oracle's portable SQL formulation
  * (`ascii(substr(s, i, 1))`-based windowed sums) on any engine — the
  * native expression only changes HOW it's computed: a single O(n) pass
  * in whole-stage codegen instead of an O(n·k·w) interpreted
  * higher-order-function chain.
  */
case class WinnowedFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")
    else if (k < 2 || k > 8 || w < 1 || w > 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k in [2, 8] and w in [1, 64], got k=$k w=$w")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    WinnowedFingerprints.fingerprints(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowedFingerprints.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowedFingerprints {
  /** Mersenne modulus 2³¹-1 and base 257: (acc·B + c) stays far below
    * 2⁶³ for any Unicode code point, in every engine's BIGINT.
    */
  val Mod = 2147483647L
  val Base = 257L

  /** One O(n) pass: code points → rolling k-gram hashes → w-window minima
    * (simple O(w) rescan per window start; w is a small constant) →
    * sorted distinct array.
    */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val nGrams = n - k + 1
    val nWin = nGrams - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)

    // code points (handles supplementary chars like the oracle's
    // character-indexed substr)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }

    // B^(k-1) mod M, for removing the outgoing character
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk = bk * Base % Mod; e += 1 }

    val hs = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + cps(i) % Mod) % Mod; i += 1 }
    hs(0) = h
    while (i < n) {
      // roll: drop cps(i-k), add cps(i)
      h = (h - (cps(i - k) % Mod) * bk % Mod + Mod * Mod) % Mod
      h = (h * Base + cps(i) % Mod) % Mod
      hs(i - k + 1) = h
      i += 1
    }

    // collect window minima allocation-free: adjacent windows usually
    // share their minimum, so skip consecutive repeats as they're
    // produced, then sort + dedup in place (no boxed TreeSet)
    val mins = new Array[Long](nWin)
    var nMins = 0
    var prev = -1L // hashes are in [0, Mod), so -1 never matches
    var wStart = 0
    while (wStart < nWin) {
      var m = hs(wStart)
      var j = 1
      while (j < w) {
        if (hs(wStart + j) < m) m = hs(wStart + j)
        j += 1
      }
      if (m != prev) { mins(nMins) = m; nMins += 1; prev = m }
      wStart += 1
    }
    java.util.Arrays.sort(mins, 0, nMins)
    var nOut = 0
    var mi = 0
    while (mi < nMins) {
      if (nOut == 0 || mins(mi) != mins(nOut - 1)) {
        mins(nOut) = mins(mi); nOut += 1
      }
      mi += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, nOut))
  }
}
