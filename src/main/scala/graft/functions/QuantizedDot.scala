package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native quantized dot product over two `ARRAY<FLOAT>` columns
  * (SURVEY §7.4 preference order (b): a custom Catalyst `Expression`
  * where the built-in formulation is interpreted).
  *
  * Semantics are EXACTLY the portable SQL form used by the oracle:
  *   Σ_i CAST(floor(CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE) * 1e12) AS BIGINT)
  * so swapping it into the ANN operators changes no results — only the
  * execution: `doGenCode` emits a tight primitive loop inside
  * whole-stage codegen, where the equivalent `zip_with` + `aggregate`
  * higher-order chain allocates a lambda frame per element per row.
  *
  * Null elements inside the arrays are not expected (the embeddings
  * tables never contain them); a null array yields null via the standard
  * BinaryExpression null contract.
  */
case class QuantizedDot(left: Expression, right: Expression)
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
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1.0e12
      acc += math.floor(p).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1.0E12;
         |  $acc += (long) java.lang.Math.floor($p);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-scoped registration of the engine's native functions. */
object GraftFunctions {
  val DotName = "graft_quantized_dot"
  val L2Name = "graft_quantized_l2"
  val ArgmaxDotName = "graft_argmax_dot"
  val HierArgmaxName = "graft_hier_argmax_dot"
  val DotTableName = "graft_dot_table"
  val L2TableName = "graft_l2_table"
  val ArgminL2Name = "graft_argmin_l2"
  val Md5PrefixName = "graft_md5_prefix"
  val WinnowName = "graft_winnow"
  val BloomBuildName = "graft_bloom_build"
  val BloomContainsName = "graft_bloom_contains"
  val TopKName = "graft_topk"
  val CharNgramsName = "graft_char_ngrams"

  private val names =
    Seq(DotName, L2Name, ArgmaxDotName, HierArgmaxName, DotTableName,
      L2TableName, ArgminL2Name,
      Md5PrefixName, WinnowName, BloomBuildName, BloomContainsName, TopKName,
      CharNgramsName)

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal, got $other")
  }

  // Bloom sizing is corpus-derived and exceeds Int range past ~260M
  // keys at the default FPR — accept both integral literal widths
  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integral literal, got $other")
  }

  private def builderOf(name: String): Seq[Expression] => Expression = name match {
    case DotName => exprs => QuantizedDot(exprs(0), exprs(1))
    case L2Name => exprs => QuantizedL2(exprs(0), exprs(1))
    case ArgmaxDotName => exprs => QuantizedArgmaxDot(exprs(0), exprs(1))
    case HierArgmaxName => exprs =>
      QuantizedHierArgmaxDot(exprs(0), exprs(1), exprs(2))
    case DotTableName => exprs => QuantizedDotTable(exprs(0), exprs(1))
    case L2TableName => exprs => QuantizedL2Table(exprs(0), exprs(1))
    case ArgminL2Name => exprs => QuantizedArgminL2(exprs(0), exprs(1))
    case Md5PrefixName => exprs =>
      Md5PrefixLong(exprs(0), intLit(exprs(1), Md5PrefixName, "nHex"))
    case WinnowName => exprs => WinnowedFingerprints(exprs(0),
      intLit(exprs(1), WinnowName, "k"), intLit(exprs(2), WinnowName, "w"))
    // Spark's own (non-SQL-exposed) bloom-filter expressions, surfaced
    // under graft names: the same pair the runtime-filter framework uses,
    // so build + probe share one serialized format and hash family.
    case BloomBuildName => exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0),
        org.apache.spark.sql.catalyst.expressions.Literal(
          longLit(exprs(1), BloomBuildName, "estItems"), LongType),
        org.apache.spark.sql.catalyst.expressions.Literal(
          longLit(exprs(2), BloomBuildName, "numBits"), LongType))
    case BloomContainsName => exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))
    case TopKName => exprs =>
      BoundedTopK(exprs(0), exprs(1), intLit(exprs(2), TopKName, "k"))
    case CharNgramsName => exprs =>
      CharNgrams(exprs(0), intLit(exprs(1), CharNgramsName, "n"))
  }

  /** The injectable descriptions for [[GraftExtensions]]. */
  def descriptions: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] =
    names.map { name =>
      (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftFunctions", name),
        builderOf(name))
    }

  def ensureRegistered(spark: SparkSession): Unit =
    names.foreach { name =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builderOf(name), "scala_udf")
    }
}
