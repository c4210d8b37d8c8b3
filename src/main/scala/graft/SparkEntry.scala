package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 appears here as a named query
  * over the test lakehouse, with an ANSI-SQL oracle (DuckDB dialect) that
  * must hash-match. Money/measure aggregates are quantized to integer cents
  * (see [[graft.operators.Determinism]]) so floating-point summation order
  * cannot cause cross-engine drift.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_scan_filter_project" -> (Relational.scanFilterProject _),
    "q03_topk_orders" -> (Relational.topkOrders _),
    "q04_region_revenue" -> (Relational.regionRevenue _),
    "q05_latest_order_join" -> (Relational.latestOrderPerCustomer _),
    "q06_latest_order_window" -> (Relational.latestOrderPerCustomerWindow _),
    "q07_unpivot_lineitem" -> (Relational.unpivotLineitem _),
    "q08_distinct_years" -> (Relational.distinctOrderYears _),
    "q09_grouped_max" -> (Relational.groupedMax _),
    "q10_lag_monotonic" -> (Relational.lagMonotonicViolations _),
    "q11_semi_join" -> (Relational.customersWithOrders _),
    "q12_anti_join" -> (Relational.customersWithoutOrders _),
  )

  // Shared SQL fragments for the oracle (DuckDB). Keep in lockstep with
  // graft.operators.Determinism.
  private def cents(e: String): String =
    s"CAST(floor(($e) * 100.0 + 0.5) AS BIGINT)"

  // DuckDB SUM(BIGINT) widens to HUGEINT; cast back so the result schema
  // matches Spark's LongType sums exactly.
  private def sumc(e: String): String = s"CAST(SUM(${cents(e)}) AS BIGINT)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumc("l_quantity")} AS sum_qty_c,
         |  ${sumc("l_extendedprice")} AS sum_base_c,
         |  ${sumc("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_c,
         |  ${sumc("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge_c,
         |  COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_scan_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, ${cents("l_extendedprice")} AS price_c
         |FROM lineitem WHERE l_quantity > 45""".stripMargin,
    "q03_topk_orders" ->
      s"""SELECT o_orderkey, ${cents("o_totalprice")} AS price_c
         |FROM orders ORDER BY price_c DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q04_region_revenue" ->
      s"""SELECT r_name, ${sumc("o_totalprice")} AS revenue_c, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,
    "q05_latest_order_join" ->
      s"""SELECT o.o_custkey, o.o_orderkey,
         |  CAST(epoch(o.o_orderdate) AS BIGINT) AS od_epoch,
         |  ${cents("o.o_totalprice")} AS price_c
         |FROM orders o
         |JOIN (SELECT o_custkey, MAX(o_orderdate) AS o_orderdate
         |      FROM orders GROUP BY o_custkey) m
         |  ON o.o_custkey = m.o_custkey AND o.o_orderdate = m.o_orderdate""".stripMargin,
    "q06_latest_order_window" ->
      s"""SELECT o_custkey, o_orderkey, od_epoch, price_c FROM (
         |  SELECT o_custkey, o_orderkey,
         |    CAST(epoch(o_orderdate) AS BIGINT) AS od_epoch,
         |    ${cents("o_totalprice")} AS price_c,
         |    ROW_NUMBER() OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |  FROM orders) t
         |WHERE rn = 1""".stripMargin,
    "q07_unpivot_lineitem" ->
      s"""SELECT l_orderkey, l_linenumber, category, amount_c FROM (
         |  SELECT l_orderkey, l_linenumber, 'quantity' AS category, ${cents("l_quantity")} AS amount_c FROM lineitem
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'extendedprice', ${cents("l_extendedprice")} FROM lineitem
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'discount', ${cents("l_discount")} FROM lineitem
         |  UNION ALL
         |  SELECT l_orderkey, l_linenumber, 'tax', ${cents("l_tax")} FROM lineitem) u
         |WHERE amount_c IS NOT NULL AND amount_c <> 0""".stripMargin,
    "q08_distinct_years" ->
      """SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS order_year
        |FROM orders ORDER BY order_year DESC""".stripMargin,
    "q09_grouped_max" ->
      s"""SELECT event_type, MAX(${cents("value")}) AS max_value_c, COUNT(*) AS n
         |FROM events GROUP BY event_type""".stripMargin,
    "q10_lag_monotonic" ->
      s"""SELECT user_id, event_id, value_c, prev_c FROM (
         |  SELECT user_id, event_id, ${cents("value")} AS value_c,
         |    LAG(${cents("value")}) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_c
         |  FROM events) t
         |WHERE prev_c IS NOT NULL AND value_c > prev_c""".stripMargin,
    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
  )
}
