package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampType}

/** The complete natural-language→SQL→answer loop (reference Q1/Q5/Q6 —
  * `dashboard/services/hive_gpt.py:151-181`, `chat_with_data_full`):
  * generate SQL from the question, sanitize (Q2), quote reserved words
  * (Q3), reroute the stock-measure anti-pattern (Q4), execute with ≤3
  * repair attempts (Q5), then summarize and suggest a chart (Q6).
  *
  * The ORCHESTRATION is deterministic and lives here; the three points
  * where the reference calls an LLM are injected [[LlmHooks]] — the
  * by-design external seam (SURVEY §2.12). Production binds an LLM
  * client; NlQueryLoopSpec binds a deterministic fake and drives the
  * full generate → guard-reroute → repair-retry → summarize path
  * end-to-end, asserting the repaired SQL's result row-equals the
  * golden query.
  *
  * Chart suggestion keeps the reference's vocabulary {bar, line, pie,
  * none} (`hive_gpt.py:121-132`): the default is a deterministic
  * schema-driven heuristic so the loop is complete without a model; an
  * LLM-backed override slots into [[LlmHooks.chartType]].
  */
object NlQueryLoop {

  /** The LLM seams of the reference loop, as injected functions:
    *  - `generate`: question → SQL (`hive_gpt.py:78-101`)
    *  - `repair`: (question, failingSql, errorOrHint) → fixed SQL
    *    (`hive_gpt.py:133-149`; also receives [[SqlGuard.RemainingHint]]
    *    on a Q4 guard trip)
    *  - `summarize`: (question, finalSql, resultPreview) → prose
    *    (`hive_gpt.py:104-118`)
    *  - `chartType`: optional LLM override of [[suggestChartType]]
    */
  final case class LlmHooks(
      generate: String => String,
      repair: (String, String, String) => String,
      summarize: (String, String, String) => String,
      chartType: Option[(String, DataFrame, Long) => String] = None)

  final case class NlAnswer(question: String, sql: String, df: DataFrame,
      rows: Long, summary: String, chartType: String, attempts: Int)

  /** Deterministic chart-type rule over the result SCHEMA + cardinality
    * (never the data): temporal x-axis → line; categorical label with a
    * measure → pie when the slice count is pie-readable, else bar; a
    * single row or no measure → none (a stat / a listing, not a chart).
    */
  def suggestChartType(df: DataFrame, rows: Long): String = {
    val fields = df.schema.fields
    val numeric = fields.exists(_.dataType.isInstanceOf[NumericType])
    val temporal = fields.exists(f =>
      f.dataType == DateType || f.dataType == TimestampType ||
        f.name.toLowerCase.matches("(year|month|date|day|week|hour)\\w*"))
    val categorical = fields.exists(_.dataType == StringType)
    if (rows == 0L || !numeric || rows == 1L) "none"
    else if (temporal) "line"
    else if (categorical && rows <= 6L) "pie"
    else "bar"
  }

  /** Bounded driver-side preview of a result for the summarize hook —
    * the reference hands the whole pandas frame to the LLM
    * (`df.to_string()`), which is fine for dashboard-sized results but
    * not a contract this engine will scale; 20 rows is the documented
    * prompt budget.
    */
  def preview(df: DataFrame, maxRows: Int = 20): String = {
    val names = df.schema.fieldNames
    val head = df.take(maxRows + 1)
    val shown = head.take(maxRows).map(_.toSeq.map(v =>
      if (v == null) "null" else v.toString).mkString("| ", " | ", " |"))
    val more = if (head.length > maxRows) s"\n… (more than $maxRows rows)" else ""
    names.mkString("| ", " | ", " |") + "\n" + shown.mkString("\n") + more
  }

  /** Reference `chat_with_data_full` (`hive_gpt.py:151-181`): the
    * end-to-end loop. `attempts` counts EXECUTIONS (guard reroutes
    * happen before the first execution, as in the reference).
    */
  def chatWithData(spark: SparkSession, question: String, hooks: LlmHooks,
      maxAttempts: Int = 3): NlAnswer = {
    val raw = hooks.generate(question)
    val guarded = SqlGuard.executeWithRepair(spark, raw,
      repair = (sql, err) => hooks.repair(question, sql, err),
      maxAttempts = maxAttempts)
    // dashboard-result cardinality: these are serving queries (aggregates
    // / top-k), so one count action is bounded by construction
    val rows = guarded.df.count()
    val summary =
      hooks.summarize(question, guarded.finalSql, preview(guarded.df))
    val chart =
      if (rows == 0L) "none"
      else hooks.chartType.map(f => f(question, guarded.df, rows))
        .getOrElse(suggestChartType(guarded.df, rows))
    NlAnswer(question, guarded.finalSql, guarded.df, rows, summary, chart,
      guarded.attempts)
  }
}
