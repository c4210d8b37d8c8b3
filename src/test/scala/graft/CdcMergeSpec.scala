package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** Hand fixture for q199's CDC merge (the oracle gate covers the
  * full-table run; this pins the precedence and checksum algebra).
  */
class CdcMergeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def orders(keys: Seq[Long]) =
    keys.map(k => (k, 100.0)).toDF("o_orderkey", "o_totalprice")

  test("merge: updates override, deletes erase, panel certifies itself") {
    // keys 1..15: updates on 7,14; delete on 13
    val r = Incremental.cdcMergeFor(orders(1L to 15L)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((15L, 2L, 1L, 14L)))
    assert(r.getBoolean(5), "matches_direct")
    // independent checksum replay: survivors are 1..15 minus 13, with
    // 7 and 14 at 110.00
    val expect = (1L to 15L).filterNot(_ == 13L).map { k =>
      val v = if (k % 7 == 0) 11000L else 10000L
      k * 1000000000L + v
    }.reduce(_ ^ _)
    assert(r.getLong(4) == expect)
  }

  test("delete wins over update on the overlap key") {
    // key 91 is both %7 and %13 — the tombstone must erase it
    val r = Incremental.cdcMergeFor(orders(Seq(90L, 91L, 92L)))
      .collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == 2L) // 91 gone
    assert(r.getBoolean(5))
  }

  test("merge is invariant to input partitioning") {
    val a = Incremental.cdcMergeFor(orders(1L to 200L)).collect().toSeq
    val b = Incremental.cdcMergeFor(orders((1L to 200L).reverse)
      .repartition(7)).collect().toSeq
    assert(a == b)
  }
}
