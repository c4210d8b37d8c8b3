package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Boundary-semantics lock for the streaming sessionization drain
  * (q147). The testdata has no event pair exactly one gap apart and no
  * session ending exactly at max event time (probed at sf0.01/sf0.1), so
  * the oracle's boundary rules — break only at `diff > gap` (exact-gap
  * arrivals MERGE), close at `end <= watermark` — cannot be exercised by
  * the gate itself. These fixtures HIT both boundaries and assert
  * Spark's `session_window` semantics are exactly the rules the q147
  * oracle SQL replays; if a Spark upgrade ever moved either boundary,
  * this spec fails before the correctness gate could silently drift.
  */
class SessionDrainSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  val T0 = 1700000000000L // ms
  val GapMs = 30L * 60L * 1000L

  private def stage(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sessspec").toString
    rows.map { case (eid, tsMs, uid) =>
      (eid, new Timestamp(tsMs), uid, "view", 1.00, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("an event exactly one gap after the last MERGES (break only at > gap)") {
    // user 1: two events exactly 30 min apart; user 2 far in the future
    // pushes the end-of-input watermark past both candidate sessions, so
    // the drained row count alone discriminates merge vs break
    val dir = stage(Seq(
      (1L, T0, 1L), (2L, T0 + GapMs, 1L), (3L, T0 + 4 * GapMs, 2L)))
    val u1 = EventsStream.sessionizeDrain(spark, dir)
      .filter("user_id = 1").collect()
    assert(u1.length == 1, "exact-gap arrival must extend the session")
    assert(u1.head.getAs[Long]("n_events") == 2L)
    // merged window: [first event, last event + gap]
    assert(u1.head.getAs[Long]("session_start_us") == T0 * 1000L)
    assert(u1.head.getAs[Long]("session_end_us") == (T0 + 2 * GapMs) * 1000L)
  }

  test("a session ending exactly AT the watermark is closed and emitted (<=)") {
    // user 1's only session ends at T0 + gap == max event time == the
    // end-of-input watermark (zero delay): the <= closure rule emits it
    val dir = stage(Seq((1L, T0, 1L), (2L, T0 + GapMs, 2L)))
    val u1 = EventsStream.sessionizeDrain(spark, dir)
      .filter("user_id = 1").collect()
    assert(u1.length == 1, "end == watermark must close the session")
    assert(u1.head.getAs[Long]("session_end_us") == (T0 + GapMs) * 1000L)
  }

  private def stageTyped(rows: Seq[(Long, Long, Int, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("attrspec").toString
    rows.map { case (eid, tsMs, tsMicros, uid, tpe) =>
      val ts = new Timestamp(tsMs)
      ts.setNanos(ts.getNanos + tsMicros * 1000)
      (eid, ts, uid, tpe, 1.00, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  val HourMs = 3600L * 1000L

  test("q152: a view emits its null row once BOTH sides' watermarks pass its window") {
    // u1's view window ends t0+1h; click-side watermark reaches t0+2h,
    // view-side t0+3h → global (min) watermark t0+2h passes the window
    val dir = stageTyped(Seq(
      (1L, T0, 0, 1L, "view"),
      (2L, T0 + 3 * HourMs, 0, 2L, "view"),
      (3L, T0 + 2 * HourMs, 0, 2L, "click")))
    val rows = EventsStream.attributionOuterDrain(spark, dir).collect()
    val u1 = rows.filter(_.getAs[Long]("view_id") == 1L)
    assert(u1.length == 1 && !u1.head.getAs[Boolean]("matched"),
      s"closed unmatched view must emit a null row: ${rows.mkString(",")}")
    // u2's view window (ends t0+4h) is still open at watermark t0+2h
    assert(!rows.exists(_.getAs[Long]("view_id") == 2L))
  }

  test("q152: an early-ending click side holds every later view window open") {
    // click-side watermark stalls at t0+30min < u1's window end t0+1h
    val dir = stageTyped(Seq(
      (1L, T0, 0, 1L, "view"),
      (2L, T0 + 3 * HourMs, 0, 2L, "view"),
      (3L, T0 + HourMs / 2, 0, 2L, "click")))
    val rows = EventsStream.attributionOuterDrain(spark, dir).collect()
    assert(rows.isEmpty,
      s"no window is closed under the min-watermark rule: ${rows.mkString(",")}")
  }

  test("q152: window end exactly AT the watermark stays open (strict <), µs floor to ms") {
    // click max lands 500 µs past u1's window end; the ms-floored
    // watermark truncates back to exactly the window end, and the
    // strict < closure keeps the view open — this fixture discriminates
    // BOTH the flooring and the strictness the oracle encodes
    val dir = stageTyped(Seq(
      (1L, T0, 0, 1L, "view"),
      (2L, T0 + 3 * HourMs, 0, 2L, "view"),
      (3L, T0 + HourMs, 500, 3L, "click")))
    val rows = EventsStream.attributionOuterDrain(spark, dir).collect()
    assert(rows.isEmpty,
      s"end == floored watermark must stay open: ${rows.mkString(",")}")
    // one millisecond later the window closes
    val dir2 = stageTyped(Seq(
      (1L, T0, 0, 1L, "view"),
      (2L, T0 + 3 * HourMs, 0, 2L, "view"),
      (3L, T0 + HourMs + 1, 0, 3L, "click")))
    val rows2 = EventsStream.attributionOuterDrain(spark, dir2).collect()
    assert(rows2.exists(r => r.getAs[Long]("view_id") == 1L &&
      !r.getAs[Boolean]("matched")),
      s"end < watermark must close: ${rows2.mkString(",")}")
  }

  test("q167: unmatched clicks close AT the watermark (<=), views keep the strict rule") {
    // A matching view must be STRICTLY earlier than its click, so a
    // click at the watermark is already provably unmatched — the click
    // side closes non-strictly (c <= wm), unlike the view side's
    // strict `end < wm` (probed: click 3 at wm == its own ts emits).
    val dir = stageTyped(Seq(
      (1L, T0, 0, 1L, "click"),
      (2L, T0 + 3 * HourMs, 0, 2L, "view"),
      (3L, T0 + 2 * HourMs, 0, 3L, "click")))
    val rows = EventsStream.attributionFullDrain(spark, dir).collect()
    val u1 = rows.filter(_.getAs[Long]("click_id") == 1L)
    assert(u1.length == 1 && u1.head.getAs[Long]("view_id") == -1L &&
      !u1.head.getAs[Boolean]("matched"),
      s"closed unmatched click must emit a null row: ${rows.mkString(",")}")
    assert(rows.exists(r => r.getAs[Long]("click_id") == 3L &&
      r.getAs[Long]("view_id") == -1L),
      s"click at the watermark is provably unmatched and must emit: ${rows.mkString(",")}")
    // the view side keeps q152's rule in the full join: u2's view window
    // (ends T0+4h) is open at wm = T0+2h
    assert(!rows.exists(_.getAs[Long]("view_id") == 2L))
    // discriminator: with the view side setting wm, a click 1 ms ABOVE
    // the watermark stays open while one AT it closes
    val dir2 = stageTyped(Seq(
      (1L, T0 + 2 * HourMs, 0, 1L, "click"),
      (2L, T0 + 2 * HourMs + 1, 0, 4L, "click"),
      (3L, T0 + 2 * HourMs, 0, 2L, "view"),
      (4L, T0 + 3 * HourMs, 0, 3L, "click")))
    val rows2 = EventsStream.attributionFullDrain(spark, dir2).collect()
    assert(rows2.exists(r => r.getAs[Long]("click_id") == 1L &&
      r.getAs[Long]("view_id") == -1L),
      s"click AT wm closes: ${rows2.mkString(",")}")
    assert(!rows2.exists(_.getAs[Long]("click_id") == 2L),
      s"click above wm stays open: ${rows2.mkString(",")}")
    assert(!rows2.exists(_.getAs[Long]("click_id") == 4L))
  }

  test("drained sessions equal the batch gaps-and-islands closed set at sf0.001") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val drained = EventsStream.sessionizeDrain(spark, sf)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toSeq).toSet
    // batch replay of the oracle's rule
    val e = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns DIV 1000").as("tus"),
        graft.operators.Determinism.cents(col("value")).as("v_c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val gapUs = GapMs * 1000L
    val maxUs = e.agg(max(col("tus"))).head.getLong(0)
    val batch = e
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("tus")).as("session_start_us"),
        (max(col("tus")) + gapUs).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("session_end_us") <= maxUs)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(_.toSeq).toSet
    assert(drained == batch)
  }
}
