package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps

/** Hand-computed rolling-actives and day-streak panels (the oracle
  * gate covers the full-table runs; this pins the window-expansion
  * semantics, the horizon cut, and the island key).
  */
class EngagementSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val dayNs = 86400000000000L

  /** Events fixture from (user, day) activity marks. */
  private def ev(rows: (Long, Long)*) =
    rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, u, d * dayNs + 1000L, "view", 1.0)
    }.toDF("event_id", "user_id", "ts_ns", "event_type", "value")

  test("q210 sliding distinct does not decompose into dailies") {
    // u1 active days 0 and 3, u2 day 3: day-3 window holds TWO users
    // even though its dailies sum to 3 user-days
    val out = EventsOps.rollingActivesFor(ev(
        (1L, 0L), (1L, 3L), (2L, 3L)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 1L, 1L), (1L, 1L, 0L), (2L, 1L, 0L), (3L, 2L, 2L)))
  }

  test("q210 windows stop at the horizon and dedupe repeat activity") {
    // one user, one day, three events that day: every window it can
    // serve is cut at max_day = 0 → a single row
    val out = EventsOps.rollingActivesFor(ev((1L, 0L), (1L, 0L), (1L, 0L)))
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L, 1L)))
  }

  test("q210 a user active twice inside one window counts once") {
    // u1 active days 0 and 2: window day 2 sees both activity days
    val out = EventsOps.rollingActivesFor(ev((1L, 0L), (1L, 2L)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 1L, 1L), (1L, 1L, 0L), (2L, 1L, 1L)))
  }

  test("q211 streak histogram on a hand grid") {
    // u1: 1-2-3 (len 3) and 7-8 (len 2); u2: 1, 3, 5 (three len-1)
    val out = EventsOps.dayStreaksFor(ev(
        (1L, 1L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
        (2L, 1L), (2L, 3L), (2L, 5L)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("q211 repeat events within a day do not split a streak") {
    val out = EventsOps.dayStreaksFor(ev(
        (1L, 4L), (1L, 4L), (1L, 5L), (1L, 5L), (1L, 6L)))
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((3L, 1L, 1L)))
  }

  /** Events fixture from explicit (user, ts seconds) marks. */
  private def evAt(rows: (Long, Long)*) =
    rows.zipWithIndex.map { case ((u, sec), i) =>
      (i.toLong, u, sec * 1000000000L, "view", 1.0)
    }.toDF("event_id", "user_id", "ts_ns", "event_type", "value")

  test("q219 sweep-line curve counts overlapping sessions per hour") {
    // u1: one session inside hour 0; u2: two single-event sessions in
    // hours 0 and 2; u3: one session SPANNING hours 0-1 (20 min gap)
    val out = graft.operators.AsOf.concurrencyCurveFor(evAt(
        (1L, 60L), (1L, 600L),
        (2L, 1800L), (2L, 7200L),
        (3L, 3000L), (3L, 4200L)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 3L, 3L), (1L, -2L, 1L), (2L, 0L, 1L), (3L, -1L, 0L)))
  }

  test("q219 running sum returns to zero after the last session") {
    val out = graft.operators.AsOf.concurrencyCurveFor(evAt(
        (1L, 100L), (2L, 5000L), (3L, 9000L)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.last._3 == 0L)
    assert(out.map(_._2).sum == 0L)
  }
}
