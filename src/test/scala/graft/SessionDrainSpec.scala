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
