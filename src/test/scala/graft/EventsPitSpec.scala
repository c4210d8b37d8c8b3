package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps

/** Hand fixtures for q190's point-in-time enrichment (the oracle gate
  * covers the full-table run; these pin the as-of semantics: state
  * pickup, the pre-state NULL bucket, and same-microsecond ties).
  */
class EventsPitSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "ts_ns", "event_type", "value")

  test("facts adopt the latest preceding state; pre-state facts are NULL") {
    val out = EventsOps.pitEnrichmentFor(ev(
      (1L, 1L, 1000000L, "signup", 0.0),
      (2L, 1L, 2000000L, "view", 10.0),
      (3L, 1L, 3000000L, "purchase", 0.0),
      (4L, 1L, 4000000L, "click", 5.0),
      (5L, 1L, 5000000L, "view", 1.0),
      (6L, 2L, 500000L, "view", 2.0)))
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out((Some("signup"), "view")) == ((1L, 1000L)))
    assert(out((Some("purchase"), "click")) == ((1L, 500L)))
    assert(out((Some("purchase"), "view")) == ((1L, 100L)))
    assert(out((None, "view")) == ((1L, 200L)))
    assert(out.size == 4)
  }

  test("same-microsecond ties settle by event_id order") {
    // state(id=10) and fact(id=11) share ts: state sorts first, fact
    // sees it; fact(id=20) BEFORE state(id=21) at equal ts stays NULL
    val out = EventsOps.pitEnrichmentFor(ev(
      (10L, 1L, 7000000L, "signup", 0.0),
      (11L, 1L, 7000000L, "click", 1.0),
      (20L, 2L, 7000000L, "click", 1.0),
      (21L, 2L, 7000000L, "signup", 0.0)))
      .collect().map(r => (Option(r.getString(0)), r.getLong(2))).toSet
    assert(out == Set((Some("signup"), 1L), (None, 1L)))
  }

  test("q195 streaming drain lands on the batch q190 panel") {
    val batch = EventsOps.pitEnrichment(spark, "/root/testdata/sf0.001")
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val stream = graft.streaming.EventsStream
      .pitDrain(spark, "/root/testdata/sf0.001")
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(stream == batch)
  }

  test("enrichment is invariant to input partitioning") {
    val rows = (1L to 40L).map(i => (i, i % 3,
      i * 1000000L, Seq("signup", "view", "click", "purchase")(
        (i % 4).toInt), i * 1.0))
    val a = EventsOps.pitEnrichmentFor(ev(rows: _*)).collect().toSet
    val b = EventsOps.pitEnrichmentFor(ev(rows: _*).repartition(7))
      .collect().toSet
    assert(a == b)
  }
}
