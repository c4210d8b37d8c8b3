package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.{AtomicPartitionWriter, FinancePipeline, LakeFs}
import graft.quality.DataQuality

/** Structured-Streaming variant of the incremental ingest (SURVEY T2's
  * idiomatic alternative): the file source + checkpoint replaces the
  * `.done` half of the marker ledger (a file is never re-read once a
  * batch commits), while the DQ gate + poison-pill quarantine — which
  * checkpointing cannot express — runs inside `foreachBatch`, reusing the
  * exact same gate and atomic writer as the batch pipeline.
  *
  * Per micro-batch: group rows by source year, gate each year, commit
  * good years through the atomic swap, record quarantined years via the
  * alert hook. `Trigger.AvailableNow` turns the same query into a
  * run-to-completion batch — the streaming/batch unification the
  * reference's 5-minute Airflow cron approximates.
  *
  * Replay safety: `foreachBatch` is at-least-once — a crash after the
  * partition swap but before the checkpoint commits replays the batch.
  * Every row therefore carries its source file ([[StreamingIngest.LineageCol]]),
  * and the merge REPLACES committed rows originating from files present
  * in the current batch instead of blindly unioning: re-applying the
  * same batch rewrites the same content (idempotent), while files from
  * earlier batches are preserved.
  */
class StreamingIngest(
    spark: SparkSession,
    fsOps: LakeFs,
    stagingDir: String,
    checkpointDir: String,
    alert: (String, String) => Unit = (_, _) => ()) {

  private val writer = new AtomicPartitionWriter(fsOps, spark)

  /** CSV file-source stream over `rawGlob` (schema must be declared for
    * streams; pass the wide schema of the lake). Adds per-row file
    * lineage (P3) — also the identity the replay-idempotent merge keys on.
    */
  def read(rawDir: String, schemaDdl: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .csv(s"$rawDir/year=*/")
      .withColumn(StreamingIngest.LineageCol, input_file_name())
      // try_cast + filter: a stray dir matching year=* but not year=NNNN
      // must not kill the stream (ANSI cast of '' throws)
      .withColumn("year",
        expr(s"try_cast(regexp_extract(${StreamingIngest.LineageCol}, " +
          "'year=(\\\\d{4})', 1) AS INT)"))
      .filter(col("year").isNotNull)

  /** The DQ-gated sink. Returns the running query (AvailableNow: call
    * `awaitTermination()` to drain everything currently in the raw zone).
    */
  def start(stream: DataFrame): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize once: the batch is re-read per year (DQ + write)
        batch.persist()
        try {
        val years = batch.select(col("year")).distinct()
          .collect().map(_.getInt(0)).sorted
        years.foreach { y =>
          val fresh = batch.filter(col("year") === y)
          // a year's files may span micro-batches (maxFilesPerTrigger, or
          // new files in a later run), so merge with the already-committed
          // partition instead of overwriting it with just this batch's
          // subset. Committed rows from files present in THIS batch are
          // dropped first (anti-join on lineage), so a crash-replay of the
          // batch rewrites the same rows instead of duplicating them.
          val committed = writer.partitionPath(stagingDir, y)
          val wide =
            if (fsOps.exists(committed)) {
              // no forced schema: unionByName(allowMissingColumns) handles
              // drift in BOTH directions — a committed column absent from
              // the current stream schema survives the merge as null-filled
              // on the fresh side, not silently dropped
              val committedDf = spark.read.parquet(committed)
              val keep =
                if (committedDf.columns.contains(StreamingIngest.LineageCol))
                  committedDf.join(
                    broadcast(fresh.select(col(StreamingIngest.LineageCol)).distinct()),
                    Seq(StreamingIngest.LineageCol), "left_anti")
                else committedDf // pre-lineage partition: keep as-is
              fresh.unionByName(keep, allowMissingColumns = true)
            } else fresh
          val amountCols = FinancePipeline.amountColumns(
            wide.drop(StreamingIngest.LineageCol))
          val report = DataQuality.run(wide,
            FinancePipeline.idColumns ++
              Seq(FinancePipeline.totalColumn, "year") ++ amountCols,
            FinancePipeline.idColumns, FinancePipeline.totalColumn, amountCols)
          if (report.fatalFailed)
            alert(s"streaming DQ failed year=$y", report.render)
          else
            writer.write(wide, stagingDir, y)
        }
        } finally batch.unpersist()
      }
      .start()
}

object StreamingIngest {
  /** Per-row source-file lineage column (P3), and the merge identity for
    * replay idempotence.
    */
  val LineageCol = "src_file"
}
