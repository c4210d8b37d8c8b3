package graft.serving

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL hygiene + guarded execution for the query-serving layer
  * (reference Q2–Q5 — `dashboard/services/hive_gpt.py`): deterministic
  * sanitizers any SQL client passes through before `spark.sql`, plus the
  * bounded repair-retry loop with the repair step injected (the reference
  * calls an LLM there; the engine only defines the seam).
  */
object SqlGuard {

  /** Strip markdown fences, normalize smart quotes, drop a trailing
    * semicolon (Q2 — `dashboard/services/hive_gpt.py:56-65`).
    */
  def cleanSql(sql: String): String = {
    var s = sql.trim
    s = s.replaceAll("(?s)^```(?:sql)?\\s*", "").replaceAll("\\s*```\\s*$", "")
    s = s.replace('‘', '\'').replace('’', '\'')
      .replace('“', '"').replace('”', '"')
    s = s.trim
    if (s.endsWith(";")) s = s.dropRight(1).trim
    s
  }

  /** Backtick-quote the reserved word `date` when used bare — idempotent,
    * word-boundary, skips already-quoted occurrences (Q3 —
    * `dashboard/services/hive_gpt.py:46-48`, tests
    * `tests/test_sql_safety.py:23-54`). Hardened beyond the reference's
    * regex: string literals are left untouched, and `DATE '...'` typed
    * literals / `CAST(... AS DATE)` keep their keyword meaning.
    */
  def quoteReservedDate(sql: String): String = {
    val token = "(?i)(?<!`)(?<!\\bas )\\bdate\\b(?!`)(?!\\s*')".r
    val literalSpans = "'(?:[^']|'')*'".r.findAllMatchIn(sql)
      .map(m => (m.start, m.end)).toList
    token.replaceAllIn(sql, m =>
      if (literalSpans.exists { case (s, e) => m.start >= s && m.start < e })
        m.matched // inside a string literal: untouched
      else "`date`")
  }

  /** Detect the summed-stock-measure anti-pattern
    * `SUM(CASE WHEN ... details = 'remaining' ...)` — summing a
    * point-in-time measure over months is wrong; the correct read is the
    * latest-per-group join (Q4 — `dashboard/services/hive_gpt.py:51-53`,
    * tests `tests/test_sql_safety.py:61-109`).
    */
  def hasBadRemainingSum(sql: String): Boolean = {
    // bounded non-greedy gap (not [^)]*) so nested calls before the
    // predicate — sum(case when round(x) > 0 and details='remaining' —
    // still trip the guard; over-triggering only costs a rewrite hint
    val re = ("(?is)sum\\s*\\(\\s*case\\s+when.{0,200}?" +
      "details\\s*=\\s*'remaining'").r
    re.findFirstIn(sql).isDefined
  }

  /** The canned rewrite hint the repair hook receives when the guard
    * trips (reference `dashboard/services/hive_gpt.py:154-156`).
    */
  val RemainingHint: String =
    "Do not SUM(CASE WHEN details='remaining'): 'remaining' is a stock " +
      "measure; join to (SELECT category, MAX(`date`) AS `date` ... GROUP " +
      "BY category) and read the latest row per category instead."

  final case class GuardedResult(df: DataFrame, finalSql: String, attempts: Int)

  /** Sanitize, guard, execute; on failure hand (sql, error) to `repair`
    * and retry, at most `maxAttempts` executions (Q5 — reference
    * `dashboard/services/hive_gpt.py:158-170`).
    */
  def executeWithRepair(
      spark: SparkSession,
      sql: String,
      repair: (String, String) => String = (s, _) => s,
      maxAttempts: Int = 3): GuardedResult = {
    var current = quoteReservedDate(cleanSql(sql))
    if (hasBadRemainingSum(current))
      current = quoteReservedDate(cleanSql(repair(current, RemainingHint)))
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val df = spark.sql(current)
        df.queryExecution.assertAnalyzed()
        return GuardedResult(df, current, attempt)
      } catch {
        case e: Throwable =>
          lastErr = e
          if (attempt < maxAttempts)
            current = quoteReservedDate(cleanSql(repair(current, e.getMessage)))
      }
    }
    throw new IllegalArgumentException(
      s"SQL failed after $attempt attempts: ${lastErr.getMessage}", lastErr)
  }
}
