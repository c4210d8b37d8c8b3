package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic numerics.
  *
  * The driver's correctness gate hash-compares our Parquet output against a
  * DuckDB oracle. Floating-point SUM is order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's scan order, so raw `sum(double)`
  * can differ in the last ULPs. The fix used throughout the query layer:
  * quantize per row (a deterministic function of bit-identical inputs in
  * both engines), then aggregate in exact integer arithmetic. Any final
  * division by the scale is a single deterministic IEEE op on identical
  * longs, so it is also bit-identical.
  */
object Determinism {
  /** floor(x*scale + 0.5) as BIGINT — deterministic fixed-point. */
  def quantize(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Money columns → integer cents. */
  def cents(c: Column): Column = quantize(c, 100L)

  /** SQL fragment mirror of [[quantize]] for the DuckDB oracle. */
  def quantizeSql(expr: String, scale: Long): String =
    s"CAST(floor(($expr) * $scale.0 + 0.5) AS BIGINT)"

  def centsSql(expr: String): String = quantizeSql(expr, 100L)
}
