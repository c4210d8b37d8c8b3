package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

class QuantizedDotSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  /** The portable higher-order-function formulation the DuckDB oracle
    * mirrors — the reference semantics the native expression must match
    * bit-for-bit.
    */
  val hof = "aggregate(zip_with(embedding, embedding, (x, y) -> " +
    "CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000000.0) AS BIGINT)), " +
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  test("native QuantizedDot equals the zip_with+aggregate formulation on every row") {
    GraftFunctions.ensureRegistered(spark)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val diff = emb.select(
        expr(s"${GraftFunctions.DotName}(embedding, embedding)").as("native"),
        expr(hof).as("portable"))
      .filter(col("native") =!= col("portable"))
    assert(diff.count() == 0)
  }

  test("native QuantizedL2 equals the per-element-quantized formulation on every row") {
    GraftFunctions.ensureRegistered(spark)
    // portable form: quantize each ELEMENT to integer micros, then
    // difference and square — what the q81 oracle computes
    val hofL2 = "aggregate(zip_with(embedding, reverse(embedding), (x, y) -> " +
      "(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) - " +
      " CAST(floor(CAST(y AS DOUBLE) * 1000000.0) AS BIGINT)) * " +
      "(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) - " +
      " CAST(floor(CAST(y AS DOUBLE) * 1000000.0) AS BIGINT))), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val diff = emb.select(
        expr(s"${GraftFunctions.L2Name}(embedding, reverse(embedding))").as("native"),
        expr(hofL2).as("portable"))
      .filter(col("native") =!= col("portable"))
    assert(diff.count() == 0)
    // identity: distance to itself is exactly zero
    val selfNonZero = emb.select(
        expr(s"${GraftFunctions.L2Name}(embedding, embedding)").as("d"))
      .filter(col("d") =!= 0L).count()
    assert(selfNonZero == 0)
  }

  test("rejects wrong argument types at analysis time") {
    GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.range(1).select(
        expr(s"${GraftFunctions.DotName}(id, id)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("native Md5PrefixLong equals the conv(substr(md5)) chain on every document shingle") {
    GraftFunctions.ensureRegistered(spark)
    // real corpus text (incl. non-ASCII): every (doc, token) hashed both
    // ways at both prefix widths used by the engine (60-bit shash,
    // 32-bit simhash/sampling)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("s"))
    val diff = toks.select(
        expr(s"${GraftFunctions.Md5PrefixName}(s, 15)").as("n15"),
        expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)").as("p15"),
        expr(s"${GraftFunctions.Md5PrefixName}(s, 8)").as("n8"),
        expr("CAST(conv(substr(md5(s), 1, 8), 16, 10) AS BIGINT)").as("p8"))
      .filter(col("n15") =!= col("p15") || col("n8") =!= col("p8"))
    assert(diff.count() == 0)
    // empty string + the interpreted (non-codegen) path agree too
    val row = spark.sql(
      s"SELECT ${GraftFunctions.Md5PrefixName}('', 15) AS a, " +
        "CAST(conv(substr(md5(''), 1, 15), 16, 10) AS BIGINT) AS b, " +
        "CAST(conv(substr(md5('abc'), 1, 15), 16, 10) AS BIGINT) AS c").collect()(0)
    assert(row.getLong(0) == row.getLong(1))
    assert(graft.functions.Md5PrefixLong.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), 15) == row.getLong(2))
  }

  test("Md5PrefixLong rejects non-string input and out-of-range widths") {
    GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.range(1).select(
        expr(s"${GraftFunctions.Md5PrefixName}(id, 15)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
    val e2 = intercept[Exception] {
      spark.range(1).select(
        expr(s"${GraftFunctions.Md5PrefixName}(CAST(id AS STRING), 16)")).collect()
    }
    assert(e2.getMessage.contains("[1, 15]"))
  }
}
