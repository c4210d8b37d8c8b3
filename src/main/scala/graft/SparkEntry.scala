package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{EventsOps, Relational, Reshape, Scalars, SetOps}

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
    "q13_pivot_returnflag" -> (Reshape.pivotByReturnFlag _),
    "q14_filtered_totals" -> (Scalars.filteredTotals _),
    "q15_sum_case_priority" -> (Scalars.sumCaseByPriority _),
    "q16_horizontal_sum" -> (Scalars.horizontalSumCheck _),
    "q17_value_remap" -> (Scalars.valueRemap _),
    "q18_regexp_extract" -> (Scalars.regexpExtractSource _),
    "q19_rlike_filter" -> (Scalars.rlikeFilter _),
    "q20_json_extract" -> (EventsOps.jsonExtractAgg _),
    "q21_events_hourly" -> (EventsOps.hourlyAgg _),
    "q22_tumbling_window" -> (EventsOps.tumblingWindowAgg _),
    "q23_set_except" -> (SetOps.openNotFinishedCustomers _),
    "q24_set_intersect" -> (SetOps.openAndFinishedCustomers _),
    "q25_union_nations" -> (SetOps.activeNationKeys _),
    "q26_distinct_partsupp" -> (SetOps.distinctPartSupp _),
    "q27_forward_fill" -> (EventsOps.forwardFill _),
    "q28_running_sum" -> (EventsOps.runningSum _),
    "q29_bulk_cast" -> (Scalars.bulkCast _),
    "q30_row_counts" -> (Scalars.rowCounts _),
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
    "q13_pivot_returnflag" ->
      s"""SELECT l_linestatus,
         |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${cents("l_quantity")} END) AS BIGINT) AS qty_a_c,
         |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${cents("l_quantity")} END) AS BIGINT) AS qty_n_c,
         |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${cents("l_quantity")} END) AS BIGINT) AS qty_r_c
         |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q14_filtered_totals" ->
      s"""SELECT
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS finished_total_c,
         |  ${sumc("o_totalprice")} AS grand_total_c,
         |  COUNT(*) AS n_orders
         |FROM orders""".stripMargin,
    "q15_sum_case_priority" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS finished_c,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS open_c,
         |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN ${cents("o_totalprice")} ELSE 0 END) AS BIGINT) AS pending_c,
         |  COUNT(*) AS n
         |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q16_horizontal_sum" ->
      s"""SELECT out_of_tolerance, COUNT(*) AS n,
         |  CAST(SUM(computed_c) AS BIGINT) AS sum_computed_c
         |FROM (
         |  SELECT
         |    ${cents("COALESCE(l_quantity, 0.0)")} + ${cents("COALESCE(l_discount, 0.0)")}
         |      + ${cents("COALESCE(l_tax, 0.0)")} AS computed_c,
         |    ${cents("l_extendedprice")} AS declared_c
         |  FROM lineitem) t,
         |  LATERAL (SELECT abs(declared_c - computed_c) * 100 > declared_c AS out_of_tolerance) x
         |GROUP BY out_of_tolerance""".stripMargin,
    "q17_value_remap" ->
      """SELECT CASE event_type
        |    WHEN 'purchase' THEN 'revenue'
        |    WHEN 'signup' THEN 'growth'
        |    WHEN 'error' THEN 'incident'
        |    ELSE event_type END AS event_class,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q18_regexp_extract" ->
      """SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) AS source_num,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1""".stripMargin,
    "q19_rlike_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE regexp_matches(text, 'spark (group|query)')""".stripMargin,
    "q20_json_extract" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS k_mod,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1""".stripMargin,
    "q21_events_hourly" ->
      s"""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch, event_type,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q22_tumbling_window" ->
      s"""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch, event_type,
         |  COUNT(*) AS n, ${sumc("value")} AS value_c
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q23_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q24_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "q25_union_nations" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        |UNION
        |SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""".stripMargin,
    "q26_distinct_partsupp" ->
      "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem",
    "q27_forward_fill" ->
      s"""SELECT user_id, event_id,
         |  last_value(CASE WHEN event_type = 'click' THEN NULL
         |                  ELSE ${cents("value")} END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c
         |FROM events""".stripMargin,
    "q28_running_sum" ->
      s"""SELECT user_id, event_id,
         |  CAST(SUM(${cents("value")})
         |    OVER (PARTITION BY user_id ORDER BY event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c
         |FROM events""".stripMargin,
    "q29_bulk_cast" ->
      s"""SELECT CAST(c_custkey AS VARCHAR) AS custkey_str,
         |  upper(c_mktsegment) AS segment_uc,
         |  CAST(c_nationkey AS BIGINT) AS nationkey_l,
         |  ${cents("c_acctbal")} AS acctbal_c
         |FROM customer""".stripMargin,
    "q30_row_counts" ->
      """SELECT 'region' AS tbl, COUNT(*) AS n_rows FROM region
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |UNION ALL SELECT 'events', COUNT(*) FROM events
        |UNION ALL SELECT 'documents', COUNT(*) FROM documents
        |UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings""".stripMargin,
  )
}
