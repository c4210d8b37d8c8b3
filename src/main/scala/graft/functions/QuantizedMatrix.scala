package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Base for the quantized vector-vs-matrix expressions: `left` is an
  * `ARRAY<FLOAT>` row vector, `right` is a FOLDABLE
  * `ARRAY<ARRAY<FLOAT>>` — the centroid/codebook matrix, evaluated ONCE
  * (driver-side constant-folded literal) and converted to a primitive
  * `float[][]` that rides into generated code as a single reference
  * object.
  *
  * This is the fix for the one genuine 100×-scale cliff VERDICT r6
  * found: expressing "dot against every centroid" as nlist separate
  * literal-array expressions makes the PLAN — and the generated
  * method — grow ∝ nlist, and `nlistFor` grows ∝ √N, so at derived
  * widths (nlist=45 already at sf0.1) the projection fell out of
  * whole-stage codegen and dumped multi-KB fallback WARNs. Here the
  * matrix is ONE literal and the loop is ONE compact generated method,
  * the same size at nlist=16 and nlist=14,000: plan size, analyzer
  * time, and codegen size are all O(1) in the index width; only the
  * per-row arithmetic (the irreducible O(nlist·dims) assignment cost)
  * grows.
  */
abstract class QuantizedMatrixExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val matOk = right.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    if (!vecOk || !matOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the matrix argument to be a literal " +
          "(the centroid/codebook table is an index artifact, not a per-row value)")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** The matrix as primitive rows — computed once per task (lazy,
    * transient), never per input row. `right` is foldable, so eval(null)
    * is safe on driver and executor alike.
    */
  @transient protected lazy val matrix: Array[Array[Float]] = {
    val m = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { j =>
      val row = m.getArray(j)
      Array.tabulate(row.numElements())(i => row.getFloat(i))
    }
  }

  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null else compute(v.asInstanceOf[ArrayData], matrix)
  }

  protected def compute(vec: ArrayData, mat: Array[Array[Float]]): Any

  /** Generated body: assign `${ev.value}` from `vec` (an ArrayData
    * variable name) and `mat` (a float[][] variable name).
    */
  protected def genBody(ctx: CodegenContext, ev: ExprCode, vec: String, mat: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("quantMatrix", matrix, "float[][]")
    nullSafeCodeGen(ctx, ev, (v, _) => genBody(ctx, ev, v, matRef))
  }
}

/** `STRUCT<bucket: BIGINT, dot: BIGINT>`: the row index of the matrix
  * row with the maximum [[QuantizedDot]] against `vec` (FIRST — lowest
  * index — on ties, matching `ROW_NUMBER ... ORDER BY dot DESC, id ASC`),
  * plus that maximum dot. Empty matrix → bucket −1, dot NULL-ish 0.
  *
  * Per-element semantics are EXACTLY [[QuantizedDot]]'s
  * (Σ ⌊a·b·1e12⌋), so swapping the per-centroid column form for this
  * expression changes no results — only plan size and codegen shape.
  */
case class QuantizedArgmaxDot(left: Expression, right: Expression)
    extends QuantizedMatrixExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("dot", LongType, nullable = false)))

  override protected def compute(vec: ArrayData, mat: Array[Array[Float]]): Any = {
    var best = Long.MinValue
    var bi = -1
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val n = math.min(vec.numElements(), c.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(vec.getFloat(i).toDouble * c(i).toDouble * 1.0e12).toLong
        i += 1
      }
      if (acc > best) { best = acc; bi = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bi.toLong, if (bi < 0) 0L else best))
  }

  override protected def genBody(
      ctx: CodegenContext, ev: ExprCode, vec: String, mat: String): String = {
    val best = ctx.freshName("best")
    val bi = ctx.freshName("bi")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val c = ctx.freshName("c")
    s"""
       |long $best = Long.MIN_VALUE;
       |int $bi = -1;
       |for (int $j = 0; $j < $mat.length; $j++) {
       |  float[] $c = $mat[$j];
       |  int $n = java.lang.Math.min($vec.numElements(), $c.length);
       |  long $acc = 0L;
       |  for (int $i = 0; $i < $n; $i++) {
       |    $acc += (long) java.lang.Math.floor(((double) $vec.getFloat($i)) * ((double) $c[$i]) * 1.0E12);
       |  }
       |  if ($acc > $best) { $best = $acc; $bi = $j; }
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
       |  new Object[]{(long) $bi, ($bi < 0) ? 0L : $best});
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `ARRAY<BIGINT>`: the [[QuantizedDot]] of `vec` against every matrix
  * row, in row order. The query-side companion of [[QuantizedArgmaxDot]]
  * — probe selection ranks this table instead of nlist separate dot
  * columns, keeping the probe plan O(1) in nlist too.
  */
case class QuantizedDotTable(left: Expression, right: Expression)
    extends QuantizedMatrixExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def compute(vec: ArrayData, mat: Array[Array[Float]]): Any = {
    val out = new Array[Long](mat.length)
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val n = math.min(vec.numElements(), c.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(vec.getFloat(i).toDouble * c(i).toDouble * 1.0e12).toLong
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def genBody(
      ctx: CodegenContext, ev: ExprCode, vec: String, mat: String): String = {
    val out = ctx.freshName("out")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val c = ctx.freshName("c")
    s"""
       |long[] $out = new long[$mat.length];
       |for (int $j = 0; $j < $mat.length; $j++) {
       |  float[] $c = $mat[$j];
       |  int $n = java.lang.Math.min($vec.numElements(), $c.length);
       |  long $acc = 0L;
       |  for (int $i = 0; $i < $n; $i++) {
       |    $acc += (long) java.lang.Math.floor(((double) $vec.getFloat($i)) * ((double) $c[$i]) * 1.0E12);
       |  }
       |  $out[$j] = $acc;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `ARRAY<BIGINT>`: the [[QuantizedL2]] distance of `vec` against every
  * matrix row, in row order. One expression replaces the k-entry
  * `array(l2(...), l2(...), …)` literal chains in the PQ code
  * assignment and the ADC lookup-table build, so the PQ plan is O(1)
  * in the codebook width k (which grows ∝ √N via `pqKFor`).
  */
case class QuantizedL2Table(left: Expression, right: Expression)
    extends QuantizedMatrixExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def compute(vec: ArrayData, mat: Array[Array[Float]]): Any = {
    val out = new Array[Long](mat.length)
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val n = math.min(vec.numElements(), c.length)
      var acc = 0L
      var i = 0
      while (i < n) {
        val qa = math.floor(vec.getFloat(i).toDouble * 1.0e6).toLong
        val qb = math.floor(c(i).toDouble * 1.0e6).toLong
        val d = qa - qb
        acc += d * d
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def genBody(
      ctx: CodegenContext, ev: ExprCode, vec: String, mat: String): String = {
    val out = ctx.freshName("out")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val c = ctx.freshName("c")
    val qa = ctx.freshName("qa")
    val qb = ctx.freshName("qb")
    val d = ctx.freshName("d")
    s"""
       |long[] $out = new long[$mat.length];
       |for (int $j = 0; $j < $mat.length; $j++) {
       |  float[] $c = $mat[$j];
       |  int $n = java.lang.Math.min($vec.numElements(), $c.length);
       |  long $acc = 0L;
       |  for (int $i = 0; $i < $n; $i++) {
       |    long $qa = (long) java.lang.Math.floor((double) $vec.getFloat($i) * 1.0e6);
       |    long $qb = (long) java.lang.Math.floor((double) $c[$i] * 1.0e6);
       |    long $d = $qa - $qb;
       |    $acc += $d * $d;
       |  }
       |  $out[$j] = $acc;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
