package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Reshape
import graft.quality.DataQuality

/** The incremental, marker-driven ingest pipeline (reference §3.1 —
  * `jobs/finance_itsc_pipeline_test_quality.py`): one `run()` performs
  * the reference's whole Airflow-triggered cycle.
  *
  * Per pending year, in order: read CSV (+ casts, + `year` column) → DQ
  * gate → atomic wide-partition commit → `.done` markers → version
  * snapshot + retention cleanup → month-filter + unpivot → atomic
  * long-partition commit. A fatal DQ failure quarantines the year's
  * files with `.failed` markers and fires an alert; the partition is not
  * touched (reference `:102-110`).
  *
  * Late data (T4): any new file in an already-processed year makes the
  * year pending again, and the partition is rebuilt from the pending
  * files then overwritten atomically — faithfully replicating the
  * reference's read-pending-only-then-overwrite behavior (a documented
  * sharp edge of the original).
  */
class FinancePipeline(
    spark: SparkSession,
    fsOps: LakeFs,
    config: FinancePipeline.Config,
    alert: (String, String) => Unit = (s, b) => FinancePipeline.log.warn(s"ALERT $s: $b")) {

  private val markers = new Markers(fsOps)
  private val writer = new AtomicPartitionWriter(fsOps, spark)
  private val versioning = new Versioning(fsOps, spark, config.versionsRoot,
    config.keepVersions, config.clock)

  import FinancePipeline._

  // the structured ledger (util.StructuredLog), when one is configured:
  // INFO progress + ERROR failures land as queryable JSON, errors also
  // in the separate error file — ref jobs/logger.py:30-71 semantics
  private def slog = graft.util.StructuredLog.current.map(_.forModule("pipeline"))

  /** One full incremental cycle. Returns per-year outcomes. */
  def run(): Seq[YearResult] =
    markers.pendingByYear(config.rawDir).map { case (year, files) =>
      try runYear(year, files)
      catch {
        case e: Throwable =>
          alert(s"pipeline year=$year failed", e.getMessage)
          slog.foreach(_.error("pipeline year failed",
            "year" -> year, "files" -> files.size,
            "error" -> String.valueOf(e.getMessage)))
          YearResult(year, files, committed = false, Some(e.getMessage))
      }
    }

  /** The reference's cron orchestration (its DAG runs the cycle on a
    * fixed schedule with catchup OFF) as a thin driver loop — the last
    * sliver of T1 not already covered by `Trigger.AvailableNow`
    * streaming ingest: run one full cycle, sleep out the REMAINDER of
    * the interval, repeat. A cycle that overruns its interval starts
    * the next one immediately and the missed ticks are simply gone
    * (catchup-off semantics: the marker ledger makes every cycle
    * incremental, so there is nothing to "backfill" — the next tick
    * picks up whatever is pending). Alerts stay on the constructor's
    * alert hook (log-only by default).
    *
    * `sleeper` and `onTick` are injectable so a spec can drive ticks
    * synchronously and land late files between them; `maxTicks` bounds
    * the loop (production passes Long.MaxValue).
    *
    * `taskCallbacks`: when given, each tick runs as the reference's
    * three-task DAG via [[dagTick]] (per-task retries + retry/failure/
    * success callbacks — `hadoop_dag.py:17-136`) instead of a bare
    * cycle; `taskRetries`/`taskRetryDelayMs` mirror the DAG's
    * `retries=2` / `retry_delay` defaults.
    */
  def runForever(
      intervalMs: Long,
      maxTicks: Long = Long.MaxValue,
      sleeper: Long => Unit = Thread.sleep,
      onTick: (Long, Seq[YearResult]) => Unit = (_, _) => (),
      taskCallbacks: Option[TaskDag.Callbacks] = None,
      taskRetries: Int = 2,
      taskRetryDelayMs: Long = 0L): Unit = {
    require(intervalMs > 0, "interval must be positive")
    var tick = 0L
    while (tick < maxTicks) {
      val t0 = config.clock()
      val results = taskCallbacks match {
        case Some(cb) => dagTick(cb, taskRetries, taskRetryDelayMs, sleeper)._2
        case None => run()
      }
      slog.foreach(_.info("tick complete", "tick" -> tick,
        "years" -> results.size,
        "committed" -> results.count(_.committed)))
      onTick(tick, results)
      tick += 1
      if (tick < maxTicks) {
        val wait = intervalMs - (config.clock() - t0)
        if (wait > 0) sleeper(wait)
      }
    }
  }

  /** One scheduler tick as the reference's exact task chain
    * (`hadoop_dag.py:121-136`): `wait_for_raw_file` (landing-zone
    * presence probe) → `run_spark_pipeline` (one [[run]] cycle) →
    * `notify_success` (success summary through the alert hook — the
    * `send_success_summary` task). Per-year DQ quarantines are HANDLED
    * failures inside the cycle (their own alert + `.failed` markers,
    * reference `:102-110`) and do not fail the task — the task fails
    * only on an unhandled error, exactly when the reference's
    * spark-submit would exit nonzero. Retrying a failed task is safe:
    * the marker ledger makes every cycle incremental and idempotent.
    *
    * Returns (per-task outcomes, the cycle's year results).
    */
  def dagTick(callbacks: TaskDag.Callbacks = TaskDag.Callbacks(),
      retries: Int = 2, retryDelayMs: Long = 0L,
      sleep: Long => Unit = Thread.sleep): (Seq[TaskDag.TaskRun], Seq[YearResult]) = {
    var results = Seq.empty[YearResult]
    val runs = TaskDag.runSequence(Seq(
      "wait_for_raw_file" -> (() =>
        if (!fsOps.exists(config.rawDir))
          throw new IllegalStateException(s"raw dir missing: ${config.rawDir}")),
      "run_spark_pipeline" -> (() => results = run()),
      "notify_success" -> (() => alert("pipeline success",
        s"years=${results.size} committed=${results.count(_.committed)}"))),
      retries, retryDelayMs, sleep, callbacks)
    (runs, results)
  }

  private def runYear(year: Int, files: Seq[String]): YearResult = {
    log.info(s"processing year=$year files=${files.size}")
    slog.foreach(_.info("processing year", "year" -> year, "files" -> files.size))
    val wide = Retry.withRetry(s"read-csv year=$year")(readWideCsv(files, year))
    val amountCols = amountColumns(wide)
    val report = DataQuality.run(wide,
      idColumns ++ Seq(totalColumn, "year") ++ amountCols,
      idColumns, totalColumn, amountCols)
    log.info(s"DQ year=$year:\n${report.render}")
    if (report.fatalFailed) {
      files.foreach(markers.markFailed)
      alert(s"DQ failed for year=$year", report.render)
      slog.foreach(_.error("DQ fatal failure — year quarantined",
        "year" -> year, "files" -> files.size, "report" -> report.render))
      return YearResult(year, files, committed = false, Some(report.render))
    }
    Retry.withRetry(s"commit-wide year=$year") {
      writer.write(wide, config.stagingDir, year)
    }
    val version = versioning.create(wide, year, files.mkString(","))
    versioning.cleanup(year)
    val long = wideToLong(wide)
    Retry.withRetry(s"commit-long year=$year") {
      writer.write(long, config.curatedDir, year)
    }
    // .done only once EVERY durable effect (wide, snapshot, long) has
    // committed: a failure anywhere above leaves the year pending, and the
    // whole sequence is idempotent (atomic overwrites), so the next cycle
    // safely redoes it. Marking earlier would strand a half-ingested year
    // forever — the ledger would say done while curated is missing.
    files.foreach(markers.markDone)
    slog.foreach(_.info("year committed",
      "year" -> year, "files" -> files.size, "version" -> version))
    YearResult(year, files, committed = true, None, Some(version))
  }

  /** CSV read + cast discipline (reference S1/P1/P2 —
    * `jobs/finance_itsc_pipeline.py:62-68`): header + inferSchema, then
    * one select casting id columns to string and everything else to
    * double, plus the path-derived `year` partition column.
    */
  def readWideCsv(paths: Seq[String], year: Int): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(paths: _*)
    val cast = raw.columns.map { c =>
      if (idColumns.contains(c)) col(c).cast("string").as(c)
      else col(c).cast("double").as(c)
    }
    raw.select(cast.toIndexedSeq: _*).withColumn("year", lit(year).cast("int"))
  }

  /** The month filter + unpivot (reference R1/P5 —
    * `jobs/finance_itsc_pipeline.py:95-113`): keep month rows and the
    * all-year-budget sentinel, stack the amount columns, drop null
    * amounts after stacking.
    */
  def wideToLong(wide: DataFrame): DataFrame =
    Reshape.wideToLong(
      wide.filter(col("date").rlike("^\\d{4}-\\d{2}$") ||
        col("date") === "all-year-budget"),
      idCols = idColumns :+ "year",
      excluded = Seq(totalColumn),
      valueCol = "amount")
}

object FinancePipeline {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[FinancePipeline])

  val idColumns: Seq[String] = Seq("date", "details")
  val totalColumn: String = "total_amount"

  /** Amount columns = all − ids − total − partition (the reference's
    * derivation rule, tested at `tests/test_etl.py:149-171`).
    */
  def amountColumns(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot(c =>
      idColumns.contains(c) || c == totalColumn || c == "year")

  final case class Config(
      rawDir: String,
      stagingDir: String,
      curatedDir: String,
      versionsRoot: String,
      keepVersions: Int = Versioning.DefaultKeep,
      clock: () => Long = () => System.currentTimeMillis())

  final case class YearResult(
      year: Int,
      files: Seq[String],
      committed: Boolean,
      error: Option[String] = None,
      version: Option[String] = None)
}
