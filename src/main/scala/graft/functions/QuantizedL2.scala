package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native quantized squared-L2 distance over two `ARRAY<FLOAT>` columns
  * (SURVEY §7.4 preference order (b), same discipline as
  * [[QuantizedDot]]).
  *
  * Semantics are EXACTLY the portable SQL form the oracle runs —
  * elements quantized to integer micros FIRST, then differenced and
  * squared in exact long arithmetic:
  *   Σ_i (⌊a[i]·1e6⌋ − ⌊b[i]·1e6⌋)²
  * so distances (and any argmin over them) are bit-identical across
  * engines and partitionings. This is the distance the PQ codebook
  * assignment uses: unlike [[QuantizedDot]] (which quantizes the
  * PRODUCT), per-element quantization lets both engines reproduce the
  * exact integer distance.
  *
  * Magnitudes: unit-ish embedding elements quantize to |q| ≤ 1e6, so a
  * squared difference is ≤ 4e12 and a 64-dim sum stays < 2⁶³ by a wide
  * margin.
  */
case class QuantizedL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val qa = math.floor(x.getFloat(i).toDouble * 1.0e6).toLong
      val qb = math.floor(y.getFloat(i).toDouble * 1.0e6).toLong
      val d = qa - qb
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qa = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1.0e6);
         |  long $qb = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1.0e6);
         |  long $d = $qa - $qb;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
