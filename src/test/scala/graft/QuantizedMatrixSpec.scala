package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Contracts of the matrix-literal expression family: per-element
  * semantics identical to the scalar QuantizedDot/QuantizedL2, FIRST
  * (lowest index) wins ties, null vector → null, empty matrix → bucket
  * −1 — and the whole family keeps the plan O(1) in the matrix width.
  */
class QuantizedMatrixSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def df = {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    Seq(
      (1L, Some(Seq(1.0f, 0.0f, 0.5f))),
      (2L, Some(Seq(-0.5f, 0.25f, 0.0f))),
      (3L, None: Option[Seq[Float]]))
      .toDF("id", "emb")
  }

  private val mat = Seq(
    Seq(1.0f, 0.0f, 0.5f),   // row 0
    Seq(0.0f, 1.0f, -1.0f),  // row 1
    Seq(1.0f, 0.0f, 0.5f))   // row 2: duplicate of row 0 (tie bait)

  test("dot table matches the scalar expression per row") {
    val rows = df.filter(col("id") =!= 3)
      .select(col("id"),
        call_function(GraftFunctions.DotTableName, col("emb"), typedLit(mat)).as("t"),
        call_function(GraftFunctions.DotName, col("emb"), typedLit(mat.head)).as("d0"),
        call_function(GraftFunctions.DotName, col("emb"), typedLit(mat(1))).as("d1"))
      .collect()
    rows.foreach { r =>
      val t = r.getSeq[Long](1)
      assert(t.length == 3)
      assert(t(0) == r.getLong(2), "table[0] must equal scalar dot vs row 0")
      assert(t(1) == r.getLong(3), "table[1] must equal scalar dot vs row 1")
      assert(t(2) == t(0), "duplicate matrix rows must produce equal dots")
    }
  }

  test("l2 table matches the scalar expression per row") {
    val rows = df.filter(col("id") =!= 3)
      .select(
        call_function(GraftFunctions.L2TableName, col("emb"), typedLit(mat)).as("t"),
        call_function(GraftFunctions.L2Name, col("emb"), typedLit(mat.head)).as("d0"),
        call_function(GraftFunctions.L2Name, col("emb"), typedLit(mat(1))).as("d1"))
      .collect()
    rows.foreach { r =>
      val t = r.getSeq[Long](0)
      assert(t(0) == r.getLong(1) && t(1) == r.getLong(2))
    }
  }

  test("argmax-dot ties break to the LOWEST matrix row index") {
    // id 1 dots: row0 == row2 (duplicates) and both beat row1 → index 0
    val r = df.filter(col("id") === 1)
      .select(call_function(GraftFunctions.ArgmaxDotName, col("emb"), typedLit(mat))
        .getField("bucket"))
      .head()
    assert(r.getLong(0) == 0L, "first of the tied rows must win")
  }

  test("argmax dot value equals the table maximum") {
    val r = df.filter(col("id") === 2)
      .select(
        call_function(GraftFunctions.ArgmaxDotName, col("emb"), typedLit(mat))
          .getField("dot"),
        array_max(call_function(GraftFunctions.DotTableName, col("emb"), typedLit(mat))))
      .head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("null vector yields null; empty matrix yields bucket -1") {
    val nullRow = df.filter(col("id") === 3)
      .select(call_function(GraftFunctions.ArgmaxDotName, col("emb"), typedLit(mat)))
      .head()
    assert(nullRow.isNullAt(0), "null embedding must propagate null")
    val empty = df.filter(col("id") === 1)
      .select(call_function(GraftFunctions.ArgmaxDotName, col("emb"),
        typedLit(Seq.empty[Seq[Float]])).getField("bucket"))
      .head()
    assert(empty.getLong(0) == -1L)
  }

  test("micro argmin-L2 equals argmin over the l2 table when the matrix is row micros") {
    // micro-quantizing the float matrix rows reproduces QuantizedL2's
    // both-sides quantization, so the two argmins must agree (round-0
    // equivalence the k-means training loop relies on)
    val micro = mat.map(_.map(v => math.floor(v.toDouble * 1e6).toLong))
    val rows = df.filter(col("id") =!= 3)
      .select(
        call_function(GraftFunctions.ArgminL2Name, col("emb"), typedLit(micro))
          .getField("bucket"),
        call_function(GraftFunctions.L2TableName, col("emb"), typedLit(mat)).as("t"))
      .collect()
    rows.foreach { r =>
      val t = r.getSeq[Long](1)
      val expected = t.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(r.getLong(0) == expected.toLong)
    }
  }
}
