package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.operators.Determinism._

/** Structured Streaming over the events firehose — the Spark-native
  * upgrade of the reference's 5-minute-cron micro-batching (SURVEY §2.10):
  * a file-source stream with checkpointed exactly-once semantics replaces
  * the marker ledger, watermarks bound state, and the same `window()`
  * aggregation code is shared with the batch path
  * ([[graft.operators.EventsOps]]).
  *
  * At scale: watermark + append mode keeps state proportional to the
  * watermark horizon, not the stream length; `dropDuplicates` keyed on
  * event_id within the watermark gives at-most-once delivery against
  * replayed files.
  */
object EventsStream {

  /** The on-disk schema of an events parquet file (ts as nanosecond long,
    * see [[graft.sources.Tables.events]]).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet files. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))

  /** Watermarked, deduplicated, hourly-windowed aggregation — the
    * streaming twin of `EventsOps.tumblingWindowAgg`, same output schema.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      // WithinWatermark variant: dedup state is evicted as the watermark
      // advances (plain dropDuplicates(event_id) would grow state forever)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .select(
        col("window.start").cast("long").as("hour_epoch"),
        col("event_type"), col("n"), col("value_c"))

  /** Session windows per user with a 30-minute gap — built-in
    * `session_window`, no hand-rolled state machine.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_c"))
      .select(
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("user_id"), col("n_events"), col("value_c"))

  /** Run a streaming DataFrame to completion against the files currently
    * in the source dir, into an in-memory table (test/dev harness —
    * production would use a durable sink + checkpoint location).
    */
  def runToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
