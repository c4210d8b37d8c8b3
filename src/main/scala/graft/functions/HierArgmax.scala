package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `STRUCT<cell: BIGINT, idx: BIGINT, dot: BIGINT>`: two-level
  * (coarse→fine) quantized-dot argmax — the hierarchical assignment
  * that breaks the flat N^1.5 law the third-decade (1000×) rehearsal
  * measured on q226/q229/q244.
  *
  * `first` is the `ARRAY<FLOAT>` row vector; `second` a FOLDABLE
  * `ARRAY<ARRAY<FLOAT>>` coarse matrix (ncoarse rows); `third` a
  * FOLDABLE `ARRAY<ARRAY<ARRAY<FLOAT>>>` of fine centroids GROUPED by
  * coarse cell, cell-indexed in coarse-matrix row order. The
  * expression picks `cell` = argmax quantized dot over the coarse
  * rows (ties → lowest index; −1 on an empty coarse matrix), then
  * `idx` = argmax over ONLY that cell's fine vectors (ties → lowest
  * within-cell index; −1 on an empty cell), with `dot` the winning
  * fine dot (0 when idx < 0).
  *
  * Per-element arithmetic is EXACTLY [[QuantizedDot]]'s Σ ⌊a·b·1e12⌋,
  * so the oracle replays it bit-for-bit. Cost per row is
  * O((ncoarse + cell_width)·dims) — with nlist ∝ √N and
  * ncoarse ∝ √nlist = N^(1/4), expected cell width is also N^(1/4),
  * so corpus assignment totals O(N^(5/4)·dims) instead of the flat
  * argmax's O(N^(3/2)·dims). The trade is approximation: a row whose
  * true nearest fine centroid lives in a different coarse cell is
  * assigned elsewhere — q253 grades that agreement rate exactly.
  *
  * Same codegen posture as [[QuantizedMatrixExpression]]: both
  * matrices are constant-folded ONCE into primitive `float[][]` /
  * `float[][][]` reference objects, so plan size, analyzer time and
  * the generated method are O(1) in both index widths.
  */
case class QuantizedHierArgmaxDot(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val coarseOk = second.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    val fineOk = third.dataType match {
      case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
      case _ => false
    }
    if (!vecOk || !coarseOk || !fineOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, " +
          s"ARRAY<ARRAY<ARRAY<FLOAT>>>), got ${first.dataType.simpleString}, " +
          s"${second.dataType.simpleString} and ${third.dataType.simpleString}")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires both matrix arguments to be literals " +
          "(the coarse/fine centroid tables are index artifacts, not per-row values)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("dot", LongType, nullable = false)))

  override def nullable: Boolean = first.nullable

  @transient private lazy val coarse: Array[Array[Float]] = {
    val m = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(m.numElements()) { j =>
      val row = m.getArray(j)
      Array.tabulate(row.numElements())(i => row.getFloat(i))
    }
  }

  @transient private lazy val fine: Array[Array[Array[Float]]] = {
    val g = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(g.numElements()) { c =>
      val cell = g.getArray(c)
      Array.tabulate(cell.numElements()) { j =>
        val row = cell.getArray(j)
        Array.tabulate(row.numElements())(i => row.getFloat(i))
      }
    }
  }

  private def qdot(vec: ArrayData, c: Array[Float]): Long = {
    val n = math.min(vec.numElements(), c.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(vec.getFloat(i).toDouble * c(i).toDouble * 1.0e12).toLong
      i += 1
    }
    acc
  }

  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    if (v == null) return null
    val vec = v.asInstanceOf[ArrayData]
    var cbest = Long.MinValue
    var ci = -1
    var j = 0
    while (j < coarse.length) {
      val d = qdot(vec, coarse(j))
      if (d > cbest) { cbest = d; ci = j }
      j += 1
    }
    var fbest = Long.MinValue
    var fi = -1
    if (ci >= 0 && ci < fine.length) {
      val cell = fine(ci)
      var k = 0
      while (k < cell.length) {
        val d = qdot(vec, cell(k))
        if (d > fbest) { fbest = d; fi = k }
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](
      ci.toLong, fi.toLong, if (fi < 0) 0L else fbest))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("hierCoarse", coarse, "float[][]")
    val fineRef = ctx.addReferenceObj("hierFine", fine, "float[][][]")
    nullSafeCodeGen(ctx, ev, (vec, _, _) => {
      val cbest = ctx.freshName("cbest")
      val ci = ctx.freshName("ci")
      val fbest = ctx.freshName("fbest")
      val fi = ctx.freshName("fi")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val cell = ctx.freshName("cell")
      s"""
         |long $cbest = Long.MIN_VALUE;
         |int $ci = -1;
         |for (int $j = 0; $j < $coarseRef.length; $j++) {
         |  float[] $c = $coarseRef[$j];
         |  int $n = java.lang.Math.min($vec.numElements(), $c.length);
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) java.lang.Math.floor(((double) $vec.getFloat($i)) * ((double) $c[$i]) * 1.0E12);
         |  }
         |  if ($acc > $cbest) { $cbest = $acc; $ci = $j; }
         |}
         |long $fbest = Long.MIN_VALUE;
         |int $fi = -1;
         |if ($ci >= 0 && $ci < $fineRef.length) {
         |  float[][] $cell = $fineRef[$ci];
         |  for (int $k = 0; $k < $cell.length; $k++) {
         |    float[] $c = $cell[$k];
         |    int $n = java.lang.Math.min($vec.numElements(), $c.length);
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (long) java.lang.Math.floor(((double) $vec.getFloat($i)) * ((double) $c[$i]) * 1.0E12);
         |    }
         |    if ($acc > $fbest) { $fbest = $acc; $fi = $k; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{(long) $ci, (long) $fi, ($fi < 0) ? 0L : $fbest});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
