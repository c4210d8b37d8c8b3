package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** Operators over the `events` stream-shaped table: time bucketing,
  * forward-fill, running totals, JSON field access. Batch analogs of the
  * reference's micro-batch semantics (SURVEY §2.10); the Structured
  * Streaming variants live in [[graft.streaming]].
  */
object EventsOps {

  /** Tumbling 1-hour aggregation via integer bucketing of the nanosecond
    * epoch. Emits the bucket start as epoch seconds so the result is
    * engine-portable (no timestamp-precision hazards).
    */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour_epoch", expr("ts_ns DIV 3600000000000") * 3600L)
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  /** Same tumbling aggregation expressed with Spark's native `window()`
    * generator — the idiom that carries over unchanged to Structured
    * Streaming (`withWatermark` + `window`).
    */
  def tumblingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .select(
        col("window.start").cast("long").as("hour_epoch"),
        col("event_type"), col("n"), col("value_c"))

  /** Forward-fill (reference P11/W3 — pandas `ffill` rewritten as a
    * `last(ignoreNulls)` running window): carry the previous non-null
    * value down each user's event sequence. 'click' events are treated
    * as the null-bearing rows to fill.
    */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("v", when(col("event_type") === "click", lit(null)).otherwise(cents(col("value"))))
      .withColumn("filled_c", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("filled_c"))
  }

  /** Running (cumulative) sum per user — the standard prefix-aggregation
    * window, kept in exact integer cents.
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        sum(cents(col("value"))).over(w).as("running_c"))
  }

  /** Typed JSON parsing with `from_json` + declared schema (vs q20's
    * path-extraction): parse once into a struct, then aggregate on the
    * typed field.
    */
  def jsonStructParse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
      .groupBy((col("p.k") >= 50).as("k_high"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  /** Time-range window frame (RANGE, not ROWS): per user, the rolling sum
    * of the past hour of activity at each event — frames defined by the
    * time axis, so ties and gaps are handled by value, not position.
    */
  def rollingHourSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
      .rangeBetween(-3600L * 1000000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        sum(cents(col("value"))).over(w).as("hour_sum_c"))
      .drop("ts_ns")
  }

  /** JSON field extraction from the `props` payload column, then a
    * grouped rollup on the extracted key. `get_json_object` is the
    * codegen'd built-in path (no UDF).
    */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS INT)"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
}
