package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.streaming.EventsStream

/** Continuous-emission benchmark for the stream-stream join family —
  * separates DRAIN-HARNESS cost from OPERATOR cost. The graded
  * q133/q152/q167 drains push the whole corpus through ONE micro-batch
  * (their 100× rehearsal exponents ~0.57–0.60 measure that harness
  * artifact, not the operator); production emits continuously, paced by
  * arriving files. This main stages the events table into N
  * time-ordered chunks, streams them through the chosen join with
  * `maxFilesPerTrigger=1` (one chunk per micro-batch, watermark
  * advancing monotonically as on a live stream), and reports per-batch
  * rows/s and state-store size from the query's progress events.
  *
  * The claim under test: per-batch cost is FLAT and state is BOUNDED
  * by the join horizon — batch k must not cost more than batch 1, and
  * state must not grow with k. `flat_ratio` (max/median data-batch
  * duration, first batch excluded as warmup) and `state_ratio`
  * (last/max state rows) make the claim one JSON line per run,
  * recorded in BASELINE.md.
  *
  * Env knobs: `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`,
  * `SPARK_GRAFT_STREAM_QUERY` (q133|q152|q167, default q152),
  * `SPARK_GRAFT_STREAM_BATCHES` (default 8).
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val queryName = sys.env.getOrElse("SPARK_GRAFT_STREAM_QUERY", "q152")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    require(nBatches >= 2, "need at least 2 batches to compare per-batch cost")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // ---- stage: the raw events table split into nBatches time-ordered
    // chunk files (~equal row counts via range partitioning on
    // (ts, event_id) — ONE distributed job, the same staging the
    // chunk-gated drains use; the per-chunk rank-filter loop this
    // replaces re-ran a single-task global sort once PER chunk, which
    // at the 1000× corpus is 50 sequential 100 M-row sorts). The split
    // reads the RAW on-disk schema — the stream's schema peek +
    // normalizeEventTime must see exactly what production files look
    // like. Per-batch row counts land in the progress ledger, so the
    // approximate (sampled) range balance is visible, not assumed.
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val landing = java.nio.file.Files.createTempDirectory("graft_streambench")
    val work = java.nio.file.Files.createTempDirectory("graft_streambench_w")
    val n = raw.count()
    raw.repartitionByRange(nBatches, col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(work.toString)
    val parts = new java.io.File(work.toString).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // an empty range partition writes no part file; the ledger reports
    // the realized batch count, so just demand enough to compare
    require(parts.length >= 2,
      s"expected >=2 chunk files for $nBatches requested batches, got ${parts.length}")
    parts.zipWithIndex.foreach { case (part, i) =>
      val dest = landing.resolve(f"chunk_$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      // strictly increasing mtimes: the file source picks oldest-first,
      // so arrival order == event-time order, as on a live stream
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000L))
    }

    // ---- the operator under test, reading one chunk per trigger/side
    def src: DataFrame = EventsStream.read(spark, landing.toString,
      Map("maxFilesPerTrigger" -> "1"))
    val joined = queryName match {
      case "q133" => EventsStream.viewClickAttribution(src, src)
      case "q152" => EventsStream.viewClickAttributionOuter(src, src)
      case "q167" => EventsStream.viewClickAttributionFull(src, src)
      case other => sys.error(s"unknown stream query '$other'")
    }
    val chk = java.nio.file.Files.createTempDirectory("graft_streambench_chk")
    val q = joined.writeStream.format("noop")
      .option("checkpointLocation", chk.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // ---- per-batch metrics from the progress ledger
    final case class B(batch: Long, rows: Long, ms: Long, stateRows: Long,
        outRows: Long)
    val progress = q.recentProgress.toSeq.map { p =>
      B(p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
        p.stateOperators.map(_.numRowsTotal).sum,
        Option(p.sink).map(_.numOutputRows).filter(_ >= 0).getOrElse(0L))
    }
    val data = progress.filter(_.rows > 0L).sortBy(_.batch)
    require(data.size >= 2, s"expected ≥2 data batches, got ${data.size}")
    // warmup (codegen/JIT/state-store open) lands in the first batch;
    // flatness is judged over the rest
    val steady = data.drop(1)
    val durations = steady.map(_.ms.toDouble).sorted
    val median = durations(durations.size / 2)
    val flatRatio = if (median > 0) durations.last / median else 0.0
    val stateRatio =
      if (data.map(_.stateRows).max > 0)
        data.last.stateRows.toDouble / data.map(_.stateRows).max else 0.0
    def jb(b: B): String = {
      val rps = if (b.ms > 0) b.rows * 1000L / b.ms else 0L
      s"""{"batch":${b.batch},"rows":${b.rows},"ms":${b.ms},""" +
        s""""rows_per_s":$rps,"state_rows":${b.stateRows},"out_rows":${b.outRows}}"""
    }
    val line =
      s"""{"metric":"stream_bench","query":"$queryName","sf":"$sfDir",""" +
        s""""n_rows":$n,"n_batches":${data.size},""" +
        s""""flat_ratio":${"%.3f".formatLocal(java.util.Locale.ROOT, flatRatio)},""" +
        s""""state_ratio":${"%.3f".formatLocal(java.util.Locale.ROOT, stateRatio)},""" +
        s""""batches":[${data.map(jb).mkString(",")}]}"""
    try spark.stop() catch { case _: Throwable => () }
    val out = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true,
      java.nio.charset.StandardCharsets.UTF_8)
    out.println(line)
    out.flush()
  }
}
