package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps
import graft.sources.Tables
import graft.streaming.EventsStream

/** Events-time portability gate (FIXTURES §events-encodings): the engine
  * must produce IDENTICAL results whether the events parquet stores `ts`
  * as TIMESTAMP(NANOS) → int64 nanos (under `nanosAsLong`) or as
  * parquet `timestamp[us]` with isAdjustedToUTC=false → TIMESTAMP_NTZ.
  * Round 8 regression: the driver regenerated testdata in the second
  * encoding and the streaming read (hardcoded ns schema) silently
  * compressed all event times 1000×, while `CAST(ts AS BIGINT)` over the
  * NTZ column threw. Both encodings are materialized here FROM THE SAME
  * ROWS and every events consumer family — batch scan, window agg,
  * streaming drains — is asserted row-identical across them, so a future
  * testdata regeneration in either encoding cannot regress silently.
  */
class EventsEncodingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  /** Two on-disk twins of the sf0.001 events table, one per encoding.
    * Built once per suite; each is a directory containing an
    * `events.parquet` directory-shaped table, so both the batch scan
    * and the streaming file source read them unchanged.
    */
  lazy val (nsDir, ntzDir): (String, String) = {
    val canonical = Tables.events(spark, sf).select(
      col("event_id"), col("ts_ns"), col("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    val ns = Files.createTempDirectory("graft-events-ns")
    val ntz = Files.createTempDirectory("graft-events-ntz")
    // encoding 1: int64 nanosecond epoch named `ts` (what TIMESTAMP(NANOS)
    // reads as under nanosAsLong)
    canonical.select(
        col("event_id"), col("ts_ns").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$ns/events.parquet")
    // encoding 2: wall-clock µs timestamp, isAdjustedToUTC=false → read
    // back as TIMESTAMP_NTZ (the driver's regenerated-testdata encoding);
    // the TIMESTAMP→NTZ cast is exact under the pinned UTC session
    canonical.select(
        col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$ntz/events.parquet")
    (ns.toString, ntz.toString)
  }

  /** Multiset of rows (row → multiplicity): a Set would collapse
    * duplicate rows and miss an encoding-dependent duplication bug.
    */
  private def rows(df: DataFrame): Map[Seq[Any], Int] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(r.get))
      .groupBy(identity).map { case (k, v) => k -> v.length }
  }

  private def assertTwins(name: String, f: (org.apache.spark.sql.SparkSession, String) => DataFrame): Unit = {
    val a = f(spark, nsDir)
    val b = f(spark, ntzDir)
    assert(a.columns.sorted.toSeq == b.columns.sorted.toSeq, s"$name: schema")
    val ra = rows(a)
    assert(ra.nonEmpty, s"$name: empty result")
    assert(ra == rows(b), s"$name: encodings diverge")
  }

  test("fixture sanity: the two twins really are differently encoded") {
    assert(spark.read.parquet(s"$nsDir/events.parquet")
      .schema("ts").dataType == LongType)
    val ntzType = spark.read.parquet(s"$ntzDir/events.parquet")
      .schema("ts").dataType
    assert(ntzType.typeName == "timestamp_ntz", s"got $ntzType")
  }

  test("batch scan normalizes both encodings to one contract (ts_ns + µs TIMESTAMP ts)") {
    for (d <- Seq(nsDir, ntzDir)) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts_ns").dataType == LongType, d)
      // never NTZ: window structs and CAST(ts AS BIGINT) downstream
      assert(ev.schema("ts").dataType == TimestampType, d)
    }
    assertTwins("events scan",
      (s, d) => Tables.events(s, d).select("event_id", "ts_ns", "user_id"))
    // ts itself agrees at µs precision across encodings
    assertTwins("events ts µs",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us")))
  }

  test("q21/q22 window family is encoding-invariant") {
    assertTwins("hourlyAgg", EventsOps.hourlyAgg)
    assertTwins("tumblingWindowAgg", EventsOps.tumblingWindowAgg)
    // and the two formulations agree with each other on both encodings
    for (d <- Seq(nsDir, ntzDir))
      assert(rows(EventsOps.hourlyAgg(spark, d)) ==
        rows(EventsOps.tumblingWindowAgg(spark, d)), s"q21 vs q22 on $d")
  }

  test("streaming drains (q127/q129/q133/q137 paths) are encoding-invariant") {
    assertTwins("scdClosedDrain", EventsStream.scdClosedDrain)
    assertTwins("funnelDrain", EventsStream.funnelDrain)
    assertTwins("attributionDrain",
      (s, d) => EventsStream.attributionDrain(s, d)
        .select("user_id", "view_id", "click_id", "gap_us"))
    assertTwins("dedupReplayDrain", EventsStream.dedupReplayDrain)
  }

  test("drained stream-stream join row count equals the batch interval join") {
    // the q133 blow-up gate: a unit mistake in the streaming read scales
    // the join window and multiplies the row count (285× in round 8) —
    // lock the drained count to the batch join on the same fixture
    val ev = Tables.events(spark, ntzDir)
      .select("user_id", "event_type", "event_id", "ts_ns")
    val batch = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_ns").as("v_ns"))
      .join(ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ns").as("c_ns")), Seq("user_id"))
      .filter(col("c_ns") > col("v_ns") &&
        col("c_ns") <= col("v_ns") + lit(3600L * 1000000000L))
      .count()
    val drained = EventsStream.attributionDrain(spark, ntzDir).count()
    assert(drained == batch, s"drained $drained vs batch $batch")
    assert(drained > 0)
  }
}
