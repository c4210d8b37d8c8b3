package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** Per-row expression operators (SURVEY §2.2/§2.5/§2.9): value remapping,
  * regex extraction/filtering, conditional aggregation, horizontal sums
  * with tolerance, bulk casts. All stock `functions._` — codegen'd, no
  * UDFs.
  */
object Scalars {

  /** Dictionary value-remap with passthrough fallback (P9 — the Thai
    * month/type mapping, `gpt_excel_fix_column.py:190-204`): a `when`
    * chain, not a UDF, so it stays inside whole-stage codegen.
    */
  def valueRemap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_class",
        when(col("event_type") === "purchase", "revenue")
          .when(col("event_type") === "signup", "growth")
          .when(col("event_type") === "error", "incident")
          .otherwise(col("event_type")))
      .groupBy(col("event_class"))
      .agg(count(lit(1)).as("n"))

  /** Regex capture-group extraction + cast (P4 — year-from-filename,
    * `jobs/finance_pipeline.py:27-30`), generalized to the document
    * source tag. `try_cast` keeps ANSI mode safe on non-matches.
    */
  def regexpExtractSource(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("source_num", expr("try_cast(regexp_extract(source, 'src(\\\\d+)', 1) AS INT)"))
      .groupBy(col("source_num"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  /** Regex row filter (P5 — the `rlike` date gate,
    * `jobs/finance_itsc_pipeline.py:103-105`).
    */
  def rlikeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").rlike("spark (group|query)"))
      .select(col("doc_id"), col("lang"), col("n_chars"))

  /** Conditional aggregation (A6 — `SUM(CASE WHEN ...)`): per order
    * priority, total price split by order status.
    */
  def sumCaseByPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", cents(col("o_totalprice"))).otherwise(0L)).as("finished_c"),
        sum(when(col("o_orderstatus") === "O", cents(col("o_totalprice"))).otherwise(0L)).as("open_c"),
        sum(when(col("o_orderstatus") === "P", cents(col("o_totalprice"))).otherwise(0L)).as("pending_c"),
        count(lit(1)).as("n"))

  /** Filtered global sum (A2 — the quick-stat totals,
    * `dashboard/components/sidebar.py:22-35`): one row, two measures.
    */
  def filteredTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(
        sum(when(col("o_orderstatus") === "F", cents(col("o_totalprice"))).otherwise(0L)).as("finished_total_c"),
        sum(cents(col("o_totalprice"))).as("grand_total_c"),
        count(lit(1)).as("n_orders"))

  /** Horizontal coalesce-sum across measure columns with a ±1% tolerance
    * flag (A5 — `jobs/data_quality.py:72-82`), kept in exact integer
    * arithmetic: deviation is `|declared−computed|·100 > declared`.
    */
  def horizontalSumCheck(spark: SparkSession, dir: String): DataFrame = {
    val computed = cents(coalesce(col("l_quantity"), lit(0.0))) +
      cents(coalesce(col("l_discount"), lit(0.0))) +
      cents(coalesce(col("l_tax"), lit(0.0)))
    Tables.lineitem(spark, dir)
      .withColumn("computed_c", computed)
      .withColumn("declared_c", cents(col("l_extendedprice")))
      .withColumn("out_of_tolerance",
        abs(col("declared_c") - col("computed_c")) * 100L > col("declared_c"))
      .groupBy(col("out_of_tolerance"))
      .agg(count(lit(1)).as("n"), sum(col("computed_c")).as("sum_computed_c"))
  }

  /** Bulk cast projection (P2 — the cast loop,
    * `jobs/finance_itsc_pipeline.py:64-68`) done as ONE select, plus
    * string normalization ops; int→string casts only (double→string
    * rendering is engine-specific).
    */
  def bulkCast(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey").cast("string").as("custkey_str"),
        upper(col("c_mktsegment")).as("segment_uc"),
        col("c_nationkey").cast("long").as("nationkey_l"),
        cents(col("c_acctbal")).as("acctbal_c"))

  /** Per-table row counts (A1 — `df.count()` scattered through the
    * reference) as one unioned inventory row set.
    */
  def rowCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.all.map { t =>
      Tables.table(spark, dir, t).agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("tbl"), col("n_rows"))
    }
    counts.reduce(_ union _)
  }
}
