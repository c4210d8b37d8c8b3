package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declarative data-contract suite (q213) — the deequ-shaped
  * constraint panel a producing pipeline publishes with every table
  * release: each constraint is one row (id, table, column, kind) with
  * its population, satisfied count, exact-ppm conformance, and the
  * verdict. The [[DataQuality]] gate is the PIPELINE's fatal/warn
  * decision; this is the CONSUMER-facing contract surface — the
  * machine-readable "what does this table guarantee" table the catalog
  * serves next to the schema.
  *
  * Constraint kinds covered: uniqueness (distinct keys vs rows),
  * completeness (non-null), pattern (anchored regex), domain (value
  * set), and range (numeric bounds).
  *
  * Scale: ONE aggregation pass per table computes every constraint's
  * measure as a `sum(case)` / `count distinct` column (map-side
  * partials, one shuffle each); the per-constraint rows are then an
  * `explode` of structs over the 1-row aggregate — the fan-out never
  * re-touches the scan, so the suite costs two table scans regardless
  * of how many constraints it carries.
  */
object Contracts {

  /** One constraint row off the 1-row aggregate; `okName` must be an
    * aggregate column alongside `n`. DIV keeps the ppm exact-integer
    * (Column `/` is double division and drifts past 2⁵³ rows).
    */
  private def ratioRow(id: String, table: String, column: String,
      kind: String, okName: String): Column =
    struct(lit(id).as("constraint_id"), lit(table).as("tbl"),
      lit(column).as("col_name"), lit(kind).as("kind"),
      col("n").as("n_rows"), col(okName).as("n_ok"),
      expr(s"$okName * 1000000 DIV n").as("ok_ppm"),
      (col(okName) === col("n")).as("pass"))

  def contractAudit(spark: SparkSession, dir: String): DataFrame =
    contractAuditFor(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  def contractAuditFor(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def cnt(pred: Column): Column =
      sum(when(pred, 1L).otherwise(0L))
    val o = orders.agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("ok_unique"),
        cnt(col("o_custkey").isNotNull).as("ok_complete"),
        cnt(col("o_orderpriority").rlike("^[1-5]-")).as("ok_pattern"),
        cnt(col("o_orderstatus").isin("O", "F", "P")).as("ok_domain"))
      .select(explode(array(
        ratioRow("c1_orderkey_unique", "orders", "o_orderkey", "unique",
          "ok_unique"),
        ratioRow("c2_custkey_complete", "orders", "o_custkey", "complete",
          "ok_complete"),
        ratioRow("c3_priority_pattern", "orders", "o_orderpriority", "pattern",
          "ok_pattern"),
        ratioRow("c4_status_domain", "orders", "o_orderstatus", "domain",
          "ok_domain"))).as("c"))
    val l = lineitem.agg(
        count(lit(1)).as("n"),
        cnt(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)
          .as("ok_qty"),
        cnt(col("l_discount") >= 0.0 && col("l_discount") <= 0.1)
          .as("ok_disc"),
        cnt(col("l_returnflag").isin("A", "N", "R")).as("ok_flag"),
        cnt(col("l_shipdate").isNotNull).as("ok_ship"))
      .select(explode(array(
        ratioRow("c5_quantity_range", "lineitem", "l_quantity", "range",
          "ok_qty"),
        ratioRow("c6_discount_range", "lineitem", "l_discount", "range",
          "ok_disc"),
        ratioRow("c7_returnflag_domain", "lineitem", "l_returnflag", "domain",
          "ok_flag"),
        ratioRow("c8_shipdate_complete", "lineitem", "l_shipdate", "complete",
          "ok_ship"))).as("c"))
    o.unionByName(l).select(col("c.*"))
  }
}
