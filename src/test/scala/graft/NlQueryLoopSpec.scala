package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{NlQueryLoop, SqlGuard}
import graft.serving.NlQueryLoop.LlmHooks

/** End-to-end NL-query loop behind a DETERMINISTIC stub LLM (the Q1/Q6
  * seam closed to its boundary — reference `chat_with_data_full`,
  * `dashboard/services/hive_gpt.py:151-181`): generate → clean (Q2) →
  * quote (Q3) → guard-reroute (Q4) → execute → bounded repairs (Q5) →
  * summarize + chart suggest (Q6). The stub emits exactly the failure
  * ladder the reference loop exists to absorb: markdown-fenced
  * smart-quoted SQL carrying the stock-measure anti-pattern, then a
  * typo'd rewrite, then the correct latest-per-group query.
  */
class NlQueryLoopSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(2)
  import spark.implicits._

  private def budgetView(): Unit = {
    Seq(
      ("ops", "2024-01-31", "remaining", 100L),
      ("ops", "2024-02-29", "remaining", 80L),
      ("ops", "2024-03-31", "remaining", 65L),
      ("it", "2024-01-31", "remaining", 50L),
      ("it", "2024-03-31", "remaining", 20L),
      ("ops", "2024-03-31", "spent", 35L))
      .toDF("category", "date", "details", "amount")
      .createOrReplaceTempView("budget_long")
  }

  // latest remaining per category — the blessed read of a stock measure
  private val goldenSql =
    """SELECT t.category, t.amount FROM budget_long t
      |JOIN (SELECT category, MAX(`date`) AS `date` FROM budget_long
      |      WHERE details = 'remaining' GROUP BY category) m
      |  ON t.category = m.category AND t.`date` = m.`date`
      |WHERE t.details = 'remaining'""".stripMargin

  test("full loop: guard reroute, repair retry, golden-equal result, summary, chart") {
    budgetView()
    // what a model would plausibly emit first: fenced, smart-quoted,
    // bare reserved `date`, and the SUM-over-stock-measure anti-pattern
    val generated =
      """```sql
        |SELECT category, SUM(CASE WHEN details = ‘remaining’ THEN amount END) AS amount
        |FROM budget_long GROUP BY category;
        |```""".stripMargin
    // repair script: hint-triggered rewrite first lands with a typo'd
    // column, the error-triggered second repair fixes it
    val typod = goldenSql.replace("t.amount", "t.amoutn")
    var calls = List.empty[String] // the error/hint each repair call saw
    val hooks = LlmHooks(
      generate = q => { assert(q.nonEmpty); generated },
      repair = (_, _, err) => {
        calls :+= err
        if (err == SqlGuard.RemainingHint) typod else goldenSql
      },
      summarize = (q, sql, preview) =>
        s"[$q] rows:\n$preview\nvia: ${sql.take(30)}")

    val ans = NlQueryLoop.chatWithData(spark, "remaining budget by category?", hooks)

    // repair sequence: guard hint first, then the analysis error
    assert(calls.length == 2)
    assert(calls.head == SqlGuard.RemainingHint)
    assert(calls(1).toLowerCase.contains("amoutn"),
      s"second repair should carry the unresolved-column error, got: ${calls(1).take(120)}")
    // guard reroute happens pre-execution; the typo'd attempt + the fixed
    // one are the two executions
    assert(ans.attempts == 2)
    // result row-equals the golden query
    val got = ans.df.select(col("category"), col("amount"))
      .as[(String, Long)].collect().sortBy(_._1)
    val want = spark.sql(goldenSql).as[(String, Long)].collect().sortBy(_._1)
    assert(got === want)
    assert(want === Array(("it", 20L), ("ops", 65L)))
    // Q6: summary built from question + preview; chart from the heuristic
    assert(ans.summary.contains("remaining budget by category?"))
    assert(ans.summary.contains("| category | amount |"))
    assert(ans.chartType == "pie") // 2 rows, categorical + numeric
    assert(ans.rows == 2L)
  }

  test("clean generated SQL executes first try; empty result suggests no chart") {
    budgetView()
    val hooks = LlmHooks(
      generate = _ => "SELECT category, amount FROM budget_long WHERE amount < 0",
      repair = (_, _, _) => fail("repair must not be called"),
      summarize = (_, _, _) => "empty")
    val ans = NlQueryLoop.chatWithData(spark, "negative budgets?", hooks)
    assert(ans.attempts == 1 && ans.rows == 0L && ans.chartType == "none")
  }

  test("chart heuristic: line for temporal, bar for wide categorical, none for stats") {
    budgetView()
    val byMonth = spark.sql(
      "SELECT `date`, SUM(amount) AS amount FROM budget_long GROUP BY 1")
    assert(NlQueryLoop.suggestChartType(byMonth, 4L) == "line")
    val manyCats = spark.sql("SELECT category, amount FROM budget_long")
    assert(NlQueryLoop.suggestChartType(manyCats, 7L) == "bar")
    val stat = spark.sql("SELECT SUM(amount) AS total FROM budget_long")
    assert(NlQueryLoop.suggestChartType(stat, 1L) == "none")
    val listing = spark.sql("SELECT category FROM budget_long")
    assert(NlQueryLoop.suggestChartType(listing, 6L) == "none")
  }

  test("loop exhausts repairs and surfaces the last error") {
    budgetView()
    val hooks = LlmHooks(
      generate = _ => "SELEC broken",
      repair = (_, sql, _) => sql, // unhelpful model: never fixes it
      summarize = (_, _, _) => fail("must not summarize a failed query"))
    val ex = intercept[IllegalArgumentException] {
      NlQueryLoop.chatWithData(spark, "?", hooks)
    }
    assert(ex.getMessage.contains("after 3 attempts"))
  }
}
