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

  test("rejects wrong argument types at analysis time") {
    GraftFunctions.ensureRegistered(spark)
    val e = intercept[Exception] {
      spark.range(1).select(
        expr(s"${GraftFunctions.DotName}(id, id)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
