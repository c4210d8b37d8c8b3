package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.SqlGuard

/** Ports the reference's SQL-safety unit tests
  * (`tests/test_sql_safety.py:23-109`) to the Scala sanitizers.
  */
class SqlGuardSpec extends AnyFunSuite {

  test("cleanSql strips fences, smart quotes, trailing semicolon") {
    assert(SqlGuard.cleanSql("```sql\nSELECT 1;\n```") == "SELECT 1")
    assert(SqlGuard.cleanSql("SELECT ‘x’, “y”") == "SELECT 'x', \"y\"")
    assert(SqlGuard.cleanSql("  SELECT 1 ;  ") == "SELECT 1")
  }

  test("reserved-date quoting: word boundary, idempotent, skips quoted") {
    assert(SqlGuard.quoteReservedDate("SELECT date FROM t") ==
      "SELECT `date` FROM t")
    assert(SqlGuard.quoteReservedDate("SELECT `date` FROM t") ==
      "SELECT `date` FROM t")
    val once = SqlGuard.quoteReservedDate("SELECT date, o_orderdate FROM t")
    assert(once == "SELECT `date`, o_orderdate FROM t")
    assert(SqlGuard.quoteReservedDate(once) == once, "idempotent")
    assert(SqlGuard.quoteReservedDate("SELECT update_s FROM t") ==
      "SELECT update_s FROM t")
  }

  test("reserved-date quoting leaves literals and typed DATE keywords alone") {
    assert(SqlGuard.quoteReservedDate("SELECT DATE '2024-01-01'") ==
      "SELECT DATE '2024-01-01'")
    assert(SqlGuard.quoteReservedDate("SELECT CAST(x AS DATE) FROM t") ==
      "SELECT CAST(x AS DATE) FROM t")
    assert(SqlGuard.quoteReservedDate("SELECT date FROM t WHERE note = 'the date is'") ==
      "SELECT `date` FROM t WHERE note = 'the date is'")
  }

  test("retry attempts at least once even with maxRetries <= 0") {
    var runs = 0
    val out = graft.lake.Retry.withRetry("t", maxRetries = 0,
      delaySeconds = 0.0, sleep = _ => ()) { runs += 1; "ok" }
    assert(out == "ok" && runs == 1)
  }

  test("bad remaining-sum detector: rejects anti-pattern, allows good patterns") {
    assert(SqlGuard.hasBadRemainingSum(
      "SELECT SUM(CASE WHEN details = 'remaining' THEN amount END) FROM t"))
    assert(SqlGuard.hasBadRemainingSum(
      "select sum( case when x=1 and details='remaining' then amount end) from t"))
    // the blessed latest-per-group pattern must pass
    assert(!SqlGuard.hasBadRemainingSum(
      """SELECT t.category, t.amount FROM long t
        |JOIN (SELECT category, MAX(`date`) AS `date` FROM long
        |      WHERE details = 'remaining' GROUP BY category) m
        |  ON t.category = m.category AND t.`date` = m.`date`""".stripMargin))
    // summing a flow measure is fine
    assert(!SqlGuard.hasBadRemainingSum(
      "SELECT SUM(CASE WHEN details = 'spent' THEN amount END) FROM t"))
  }

  test("executeWithRepair: runs clean SQL, repairs broken SQL, bounded attempts") {
    val spark = GraftSession.local(2)
    val ok = SqlGuard.executeWithRepair(spark, "SELECT 1 AS x;")
    assert(ok.attempts == 1)
    assert(ok.df.collect()(0).getInt(0) == 1)

    var repairs = 0
    val fixed = SqlGuard.executeWithRepair(spark, "SELEC 1 AS x",
      repair = (_, _) => { repairs += 1; "SELECT 1 AS x" })
    assert(repairs == 1 && fixed.attempts == 2)

    val ex = intercept[IllegalArgumentException] {
      SqlGuard.executeWithRepair(spark, "SELEC nope",
        repair = (s, _) => s, maxAttempts = 3)
    }
    assert(ex.getMessage.contains("after 3 attempts"))
  }
}
