package graft.lake

/** Airflow-parity task orchestration semantics (reference
  * `airflow/dags/hadoop_dag.py:17-136`): a linear task sequence where
  * each task gets `retries` re-attempts with a fixed delay, fires
  * `on_retry` / `on_failure` / `on_success` callbacks per attempt
  * outcome, and a failed task SKIPS everything downstream
  * (Airflow's `upstream_failed` state). [[FinancePipeline.dagTick]]
  * instantiates the reference's exact three-task chain
  * (`wait_for_raw_file >> run_spark_pipeline >> notify_success`).
  *
  * This is deliberately driver-side control flow, not a Spark job:
  * tasks wrap whole pipeline cycles. Distribution happens inside the
  * tasks; the DAG layer only sequences, retries, and notifies —
  * exactly the division of labor the reference has between Airflow
  * and spark-submit.
  */
object TaskDag {

  /** The reference DAG's callback surface (`hadoop_dag.py:17-101`):
    *  - `onRetry(taskId, failedAttempt)` — an attempt failed and a
    *    retry remains (`alert_on_retry`)
    *  - `onFailure(taskId, finalAttempt, error)` — the last attempt
    *    failed (`alert_on_failure`)
    *  - `onSuccess(taskId, attempts)` — the task succeeded (Airflow's
    *    per-task `on_success_callback`)
    */
  final case class Callbacks(
      onRetry: (String, Int) => Unit = (_, _) => (),
      onFailure: (String, Int, Throwable) => Unit = (_, _, _) => (),
      onSuccess: (String, Int) => Unit = (_, _) => ())

  /** One task's outcome. `skipped` = an upstream task failed and this
    * one never ran (attempts = 0).
    */
  final case class TaskRun(taskId: String, attempts: Int,
      succeeded: Boolean, error: Option[String] = None,
      skipped: Boolean = false)

  /** Run `tasks` in order with Airflow retry semantics: each task gets
    * `retries` + 1 attempts; `sleep(retryDelayMs)` between attempts
    * (the DAG's `retry_delay`); after a task exhausts its attempts the
    * remaining tasks are recorded as skipped. Returns one [[TaskRun]]
    * per declared task, in order.
    */
  def runSequence(tasks: Seq[(String, () => Unit)],
      retries: Int = 2,
      retryDelayMs: Long = 0L,
      sleep: Long => Unit = Thread.sleep,
      callbacks: Callbacks = Callbacks()): Seq[TaskRun] = {
    require(retries >= 0, "retries must be non-negative")
    val out = Seq.newBuilder[TaskRun]
    var upstreamFailed = false
    for ((taskId, action) <- tasks) {
      if (upstreamFailed)
        out += TaskRun(taskId, 0, succeeded = false,
          error = Some("upstream_failed"), skipped = true)
      else {
        var attempt = 0
        var ok = false
        var lastErr: Option[Throwable] = None
        while (!ok && attempt <= retries) {
          attempt += 1
          try { action(); ok = true; lastErr = None }
          catch {
            case e: Throwable =>
              lastErr = Some(e)
              if (attempt <= retries) {
                callbacks.onRetry(taskId, attempt)
                if (retryDelayMs > 0L) sleep(retryDelayMs)
              } else callbacks.onFailure(taskId, attempt, e)
          }
        }
        if (ok) callbacks.onSuccess(taskId, attempt)
        else upstreamFailed = true
        out += TaskRun(taskId, attempt, ok, lastErr.map(e =>
          String.valueOf(e.getMessage)))
      }
    }
    out.result()
  }
}
