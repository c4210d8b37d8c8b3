package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsAudit

/** Hand-computed CUSUM and Benford fixtures (the oracle gate covers
  * the full-table runs; these pin the scaled-integer arithmetic and
  * the peak/deviation semantics).
  */
class StatsAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def orders(rows: (Long, Double)*) =
    rows.toDF("day", "o_totalprice")
      .select(to_timestamp(col("day") * 86400L).as("o_orderdate"),
        col("o_totalprice"))

  test("CUSUM localizes a level shift at the boundary day") {
    // 4 days at $100 then 4 at $200: C_t = 8·S_t − t·S_8 bottoms at
    // t=4 (−160000 cents·8), C/n = −20000; C_8 = 0
    val rows = (1L to 4L).map(d => (d, 100.0)) ++
      (5L to 8L).map(d => (d, 200.0))
    val out = StatsAudit.revenueCusumFor(orders(rows: _*))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((10000L, -5000L, false)))
    assert(out(4L) == ((10000L, -20000L, true)))
    assert(out(5L) == ((20000L, -15000L, false)))
    assert(out(8L) == ((20000L, 0L, false)))
    assert(out.values.count(_._3) == 1)
  }

  test("CUSUM is flat zero on a constant series") {
    val out = StatsAudit.revenueCusumFor(
      orders((1L to 5L).map(d => (d, 42.0)): _*))
      .collect().map(r => (r.getLong(3), r.getBoolean(4)))
    assert(out.forall { case (c, p) => c == 0L && p }) // all tie at |0|
  }

  test("Benford audit: exact ppm shares and shared expectation constants") {
    val prices = Seq(1.00, 1.50, 1.99, 2.50, 9.99)
    val out = StatsAudit.benfordAuditFor(
      prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("l_orderkey", "l_extendedprice"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exp = StatsAudit.BenfordPpm.toMap
    assert(out(1L) == ((3L, 600000L, exp(1), 600000L - exp(1))))
    assert(out(2L) == ((1L, 200000L, exp(2), 200000L - exp(2))))
    assert(out(9L) == ((1L, 200000L, exp(9), 200000L - exp(9))))
    assert(out.size == 3)
    // the constants are the floor'd Benford logs
    assert(exp(1) == 301029L && exp(9) == 45757L)
  }
}
