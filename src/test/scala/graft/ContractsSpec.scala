package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Contracts

/** Hand-violated fixtures for the q213 contract suite: every
  * constraint kind trips on exactly the rows built to trip it.
  */
class ContractsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")

  // key 1 duplicated; key 3 has null custkey; key 4 bad priority;
  // key 5 bad status
  private val orders = Seq(
    (1L, Option(10L), "O", "1-URGENT"),
    (1L, Option(11L), "F", "2-HIGH"),
    (3L, None, "P", "3-MEDIUM"),
    (4L, Option(12L), "O", "URGENT"),
    (5L, Option(13L), "X", "4-NOT SPECIAL"))
    .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  // row 2: qty 0 (under); row 3: discount 0.2 (over); row 4: flag 'Z';
  // row 5: null shipdate
  private val lineitem = Seq(
    (1L, 5.0, 0.05, "A", Option(ts)),
    (2L, 0.0, 0.05, "N", Option(ts)),
    (3L, 5.0, 0.2, "R", Option(ts)),
    (4L, 5.0, 0.05, "Z", Option(ts)),
    (5L, 5.0, 0.05, "A", None))
    .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag",
      "l_shipdate")

  test("every constraint kind measures its planted violations") {
    val out = Contracts.contractAuditFor(orders, lineitem)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))))
      .toMap
    assert(out.size == 8)
    // 5 rows, 4 distinct keys (1 duplicated)
    assert(out("c1_orderkey_unique") == ((5L, 4L, 800000L, false)))
    assert(out("c2_custkey_complete") == ((5L, 4L, 800000L, false)))
    assert(out("c3_priority_pattern") == ((5L, 4L, 800000L, false)))
    assert(out("c4_status_domain") == ((5L, 4L, 800000L, false)))
    assert(out("c5_quantity_range") == ((5L, 4L, 800000L, false)))
    assert(out("c6_discount_range") == ((5L, 4L, 800000L, false)))
    assert(out("c7_returnflag_domain") == ((5L, 4L, 800000L, false)))
    assert(out("c8_shipdate_complete") == ((5L, 4L, 800000L, false)))
  }

  test("a clean table passes every constraint at 1e6 ppm") {
    val cleanO = Seq((1L, Option(10L), "O", "1-URGENT"),
      (2L, Option(11L), "F", "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val cleanL = Seq((1L, 1.0, 0.0, "A", Option(ts)),
      (2L, 50.0, 0.1, "R", Option(ts)))
      .toDF("l_orderkey", "l_quantity", "l_discount", "l_returnflag",
        "l_shipdate")
    val out = Contracts.contractAuditFor(cleanO, cleanL).collect()
    assert(out.length == 8)
    assert(out.forall(r => r.getBoolean(7) && r.getLong(6) == 1000000L))
  }
}
