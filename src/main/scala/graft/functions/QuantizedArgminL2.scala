package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `STRUCT<bucket: BIGINT, dist: BIGINT>`: the row index of the
  * MICRO-QUANTIZED centroid matrix minimizing the exact integer squared
  * L2 distance to `vec` (FIRST — lowest index — on ties), plus that
  * minimum distance.
  *
  * Unlike [[QuantizedL2Table]] (whose matrix is raw floats, quantized
  * per element like the vector side), the matrix here is ALREADY in
  * integer micro space — `ARRAY<ARRAY<BIGINT>>`, each entry
  * ⌊c·1e6⌋-scaled. That is the k-means TRAINING loop's data type: after
  * the first Lloyd round a centroid is a per-bucket integer mean
  * (⌊Σq/n⌋ of micro elements), not any input row, so assignment rounds
  * ≥ 1 measure the distance Σ(⌊v·1e6⌋ − m)² between a quantized vector
  * and an integer centroid — all-long arithmetic, no doubles, so every
  * round's assignment is bit-identical in the oracle. Round 0 composes
  * too: passing the seed vectors' own micro quantization makes this
  * identical to the [[QuantizedL2]] distance to the raw seeds.
  *
  * The matrix argument must be foldable (an index artifact, one literal
  * per round); like the [[QuantizedMatrixExpression]] family it is
  * converted once to a primitive `long[][]`, so plan and codegen size
  * stay O(1) in the centroid count.
  */
case class QuantizedArgminL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val matOk = right.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (!vecOk || !matOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<BIGINT>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the matrix argument to be a literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val matrix: Array[Array[Long]] = {
    val m = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { j =>
      val row = m.getArray(j)
      Array.tabulate(row.numElements())(i => row.getLong(i))
    }
  }

  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    var best = Long.MaxValue
    var bi = -1
    var j = 0
    while (j < matrix.length) {
      val c = matrix(j)
      val n = math.min(vec.numElements(), c.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = math.floor(vec.getFloat(i).toDouble * 1.0e6).toLong - c(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bi = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bi.toLong, if (bi < 0) 0L else best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("microMatrix", matrix, "long[][]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      s"""
         |long $best = Long.MAX_VALUE;
         |int $bi = -1;
         |for (int $j = 0; $j < $matRef.length; $j++) {
         |  long[] $c = $matRef[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $c.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = (long) java.lang.Math.floor((double) $v.getFloat($i) * 1.0e6) - $c[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bi = $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(long) $bi, ($bi < 0) ? 0L : $best});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
