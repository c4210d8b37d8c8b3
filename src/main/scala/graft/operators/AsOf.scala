package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** As-of (point-in-time) join — an operator Spark SQL lacks natively.
  *
  * Implemented Spark-first as the union-tag + running-window pattern
  * rather than a per-key join: tag both sides, union, sort each key's
  * timeline once, and carry the most recent right-side value forward with
  * `last(ignoreNulls)`. One shuffle on the key, no range-condition join
  * explosion — at 100 TB this is a single repartition + in-partition
  * sort, where a naive `left JOIN right ON l.ts >= r.ts` would be a
  * quadratic theta join.
  *
  * Concrete instance: for every purchase event, the user's most recent
  * signup event at or before it.
  */
object AsOf {

  /** Generic as-of join: left/right both keyed by `key` with event time
    * `ts`; every left row gains `asof_<valueCol>` = the latest right
    * `valueCol` with right.ts <= left.ts.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
        col(key), col(ts),
        lit(0).as("__side"), col(valueCol).as("__rv"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at the same timestamp, so an exact
    // tie is visible to the left row (<=, not <). The trailing __rv sort
    // totally orders tied RIGHT rows (max value wins deterministically);
    // tied left rows all carry null __rv, so their relative order — the
    // one place engines differ on null placement — cannot affect results.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }

  /** q: each purchase joined to the user's latest signup at-or-before it
    * (event ids kept integral for oracle exactness).
    */
  def purchaseAsofSignup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("signup_event"))
    asofJoin(purchases, signups, "user_id", "ts_ns", "signup_event")
      .select(col("user_id"), col("event_id"), col("asof_signup_event"))
  }

  /** Batch sessionization: a session breaks after a 30-minute silence;
    * session id = running count of gap-breaks per user. The classic
    * two-window formulation — no state machine, no UDF.
    */
  def sessionizeEvents(spark: SparkSession, dir: String): DataFrame =
    sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        sum(cents(col("value"))).as("value_c"))

  /** Every event with its gap-sessionization `session_id` attached — the
    * shared front half of [[sessionizeEvents]] and [[sessionConversion]]
    * (one user-keyed shuffle, two in-partition windows).
    */
  private def sessionAssigned(spark: SparkSession, dir: String): DataFrame =
    sessionAssignedFor(Tables.events(spark, dir))

  private[operators] def sessionAssignedFor(events: DataFrame): DataFrame = {
    val gapNs = 30L * 60 * 1000000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns").asc, col("event_id").asc)
    val runningBreaks = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(runningBreaks))
  }

  /** Concurrently-open sessions at each purchase (q110) — the graded
    * instance of [[RangeJoin.binnedPointInInterval]]: purchases are
    * points, the gap-sessions of ALL users are intervals, and the
    * answer is how many sessions were open at each purchase moment.
    * Both sides are event-scale (never a broadcastable dimension), which
    * is exactly the shape Spark would otherwise plan as a quadratic
    * nested-loop theta join; the 1-hour bin turns it into a hash
    * equi-join on the bin key plus an exact residual filter.
    */
  def openSessionsAtPurchase(spark: SparkSession, dir: String): DataFrame = {
    val assigned = sessionAssigned(spark, dir)
    val intervals = assigned
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ns")).as("s_start"), max(col("ts_ns")).as("s_end"))
      .select(col("s_start"), col("s_end"))
    val purchases = assigned
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_ns"))
    RangeJoin.binnedPointInInterval(
        purchases, "ts_ns", intervals, "s_start", "s_end",
        binSize = 3600000000000L) // 1 h in ns: gap-bounded sessions span few bins
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("open_sessions"))
  }

  /** Hour grain for the q219 concurrency sweep. */
  val CurveHourNs = 3600000000000L

  /** Hourly session-concurrency curve (q219) — the SWEEP-LINE /
    * difference-array pattern, the third interval idiom beside the
    * binned range join (q110: open sessions AT EACH POINT query) and
    * the capped overlap join (q125: interval×interval pairs): the
    * GLOBAL concurrency timeline needs no join at all. Every session
    * interval emits two boundary deltas (+1 at its first hour, −1
    * after its last), deltas aggregate per hour, and a prefix sum over
    * the hour relation reconstructs how many sessions overlap each
    * breakpoint hour — capacity planning's load curve.
    *
    * Scale: 2 boundary rows per interval regardless of span, one
    * hour-keyed aggregation, and ONE ordered window over the
    * hour-bounded delta relation (calendar-sized, like the q179 day
    * relation — never over facts). q110 answers "how many at THIS
    * point" per point; this answers "the whole curve" in one pass.
    */
  def concurrencyCurve(spark: SparkSession, dir: String): DataFrame =
    concurrencyCurveFor(Tables.events(spark, dir))

  def concurrencyCurveFor(events: DataFrame): DataFrame = {
    val intervals = sessionAssignedFor(events)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ns")).as("s_start"), max(col("ts_ns")).as("s_end"))
    val deltas = intervals
      .select(expr(s"s_start DIV $CurveHourNs").as("hour"), lit(1L).as("d"))
      .unionByName(intervals
        .select(expr(s"s_end DIV $CurveHourNs + 1").as("hour"),
          lit(-1L).as("d")))
      .groupBy(col("hour")).agg(sum(col("d")).as("delta"))
    deltas
      .withColumn("open_sessions", sum(col("delta")).over(
        Window.orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("hour"), col("delta"), col("open_sessions"))
  }

  /** Session path analysis (q115) — the top-of-session event-type
    * sequences product analytics reads entry behavior from: each
    * session reduced to its first three event types (short sessions
    * padded with '-'), counted per path. The per-position conditional
    * `max(when(rn = k))` keeps the collapse a plain aggregation — no
    * collect_list, whose ordering is not an engine-portable contract.
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val bySession = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    def pos(k: Int) =
      coalesce(max(when(col("rn") === k, col("event_type"))), lit("-")).as(s"e$k")
    sessionAssigned(spark, dir)
      .withColumn("rn", row_number().over(bySession))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"), col("session_id"))
      .agg(pos(1), pos(2), pos(3))
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Session concurrency matrix (q117) — the graded instance of
    * [[RangeJoin.binnedIntervalOverlap]]: for each (user, user) pair,
    * how many of their session intervals overlapped in time. The
    * interval-interval self-join both sides event-scale; `ua < ub`
    * orders each pair once.
    */
  def sessionOverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val iv = sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ns")).as("sa"), max(col("ts_ns")).as("ea"))
    val a = iv.select(col("user_id").as("ua"), col("sa"), col("ea"))
    val b = iv.select(col("user_id").as("ub"),
      col("sa").as("sb"), col("ea").as("eb"))
    RangeJoin.binnedIntervalOverlap(a, "sa", "ea", b, "sb", "eb",
        binSize = 3600000000000L)
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_overlaps"))
  }

  /** CAPPED session concurrency matrix (q125) — q117 through
    * [[RangeJoin.cappedIntervalOverlapSelf]], the production form: per
    * time bin only the [[RangeJoin.OverlapBinCap]] lexicographically
    * smallest (user, session) intervals participate, so a dense global
    * window contributes O(cap²) pair state instead of detonating
    * quadratically (q117's measured 0.85 exponent at 10×). Pairs the
    * cap admits are identical to q117's; densest-window pairs beyond it
    * are deterministically dropped — the audit column story is the
    * count delta vs q117 on a bounded window.
    */
  def sessionOverlapMatrixCapped(spark: SparkSession, dir: String): DataFrame = {
    val iv = sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_ns")).as("sa"), max(col("ts_ns")).as("ea"))
      .select(struct(col("user_id"), col("session_id")).as("iid"),
        col("sa"), col("ea"))
    RangeJoin.cappedIntervalOverlapSelf(iv, "iid", "sa", "ea",
        binSize = 3600000000000L)
      .select(col("id_a.user_id").as("ua"), col("id_b.user_id").as("ub"))
      .filter(col("ua") < col("ub"))
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_overlaps"))
  }

  /** Per-day session conversion rate (q103) — the metric the funnel
    * (q97) and sessionization (q46) exist to feed: sessions grouped by
    * their start day, with the share that contain a purchase, in exact
    * ppm. One extra aggregation over the shared session assignment; the
    * day rollup is a tiny second shuffle.
    */
  def sessionConversion(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    sessionAssigned(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(expr(s"ts_ns DIV $dayNs")).as("start_day"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      .groupBy(col("start_day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converting"))
      .withColumn("conv_ppm", expr("n_converting * 1000000 DIV n_sessions"))
  }
}
