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

  test("q233 kaplan-meier: hand-computed curve with censoring") {
    // horizon M = 10. Users: u1 days {0..2} → t=2 death; u2 {0..2} →
    // t=2 death; u3 {0,5} → t=5 death; u4 {3..10} → t=7 CENSORED
    // (ld = M); u5 {10} → t=0 censored.
    // t=0: n=5 d=0 c=1 → s = 1e6
    // t=2: n=4 d=2 c=0 → s = 1e6*2/4 = 500000
    // t=5: n=2 d=1 c=0 → s = 500000*1/2 = 250000
    // t=7: n=1 d=0 c=1 → s = 250000
    val act = Seq(
      (1L, 0L), (1L, 1L), (1L, 2L),
      (2L, 0L), (2L, 2L),
      (3L, 0L), (3L, 5L),
      (4L, 3L), (4L, 10L),
      (5L, 10L)).toDF("user_id", "day")
    val out = EventsOps.kaplanMeierFor(act).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 5L, 0L, 1L, 0L, 1000000L),
      (2L, 4L, 2L, 0L, 500000L, 500000L),
      (5L, 2L, 1L, 0L, 500000L, 250000L),
      (7L, 1L, 0L, 1L, 0L, 250000L)))
  }

  test("q233 kaplan-meier: all-censored corpus never loses survival") {
    // every user's last day is the horizon → zero deaths, s stays 1e6
    val act = Seq((1L, 0L), (1L, 9L), (2L, 4L), (2L, 9L), (3L, 9L))
      .toDF("user_id", "day")
    val out = EventsOps.kaplanMeierFor(act).collect()
    assert(out.forall(_.getLong(5) == 1000000L))
    assert(out.map(_.getLong(2)).sum == 0L)
  }
}
