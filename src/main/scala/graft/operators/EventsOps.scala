package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** Operators over the `events` stream-shaped table: time bucketing,
  * forward-fill, running totals, JSON field access. Batch analogs of the
  * reference's micro-batch semantics (SURVEY §2.10); the Structured
  * Streaming variants live in [[graft.streaming]].
  */
object EventsOps {

  /** Tumbling 1-hour aggregation via integer bucketing of the nanosecond
    * epoch. Emits the bucket start as epoch seconds so the result is
    * engine-portable (no timestamp-precision hazards).
    */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour_epoch", expr("ts_ns DIV 3600000000000") * 3600L)
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  /** Same tumbling aggregation expressed with Spark's native `window()`
    * generator — the idiom that carries over unchanged to Structured
    * Streaming (`withWatermark` + `window`).
    */
  def tumblingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .select(
        col("window.start").cast("long").as("hour_epoch"),
        col("event_type"), col("n"), col("value_c"))

  /** Forward-fill (reference P11/W3 — pandas `ffill` rewritten as a
    * `last(ignoreNulls)` running window): carry the previous non-null
    * value down each user's event sequence. 'click' events are treated
    * as the null-bearing rows to fill.
    */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("v", when(col("event_type") === "click", lit(null)).otherwise(cents(col("value"))))
      .withColumn("filled_c", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("event_id"), col("filled_c"))
  }

  /** Running (cumulative) sum per user — the standard prefix-aggregation
    * window, kept in exact integer cents.
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        sum(cents(col("value"))).over(w).as("running_c"))
  }

  /** Typed JSON parsing with `from_json` + declared schema (vs q20's
    * path-extraction): parse once into a struct, then aggregate on the
    * typed field.
    */
  def jsonStructParse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
      .groupBy((col("p.k") >= 50).as("k_high"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  /** Time-range window frame (RANGE, not ROWS): per user, the rolling sum
    * of the past hour of activity at each event — frames defined by the
    * time axis, so ties and gaps are handled by value, not position.
    */
  def rollingHourSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
      .rangeBetween(-3600L * 1000000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        sum(cents(col("value"))).over(w).as("hour_sum_c"))
      .drop("ts_ns")
  }

  /** Conversion window for [[funnelStages]]: each funnel step must occur
    * within 24 h of the previous step's first touch.
    */
  val FunnelWindowNs: Long = 24L * 3600L * 1000000000L

  /** Staged first-touch funnel (q97) — per user, the deepest
    * view → click → purchase stage reached in strict temporal order
    * (the first click must FOLLOW the first view, the first purchase
    * must follow that click), rolled up to per-stage user counts and
    * ppm shares. Each step must land within the [[FunnelWindowNs]]
    * conversion window of the previous one — the standard product
    * definition ("clicked within a day of first seeing it"), and what
    * keeps the funnel discriminating instead of saturating over an
    * unbounded horizon. The iterated-minimum formulation is the scalable
    * funnel: each stage is one filtered aggregation plus one user-keyed
    * equi-join — no per-user event array is ever collected, so a power
    * user with millions of events costs the same as anyone else.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
    def firstAfter(evType: String, prev: DataFrame, prevCol: String,
        outCol: String): DataFrame =
      ev.filter(col("event_type") === evType)
        .join(prev, Seq("user_id"))
        .filter(col("ts_ns") > col(prevCol) &&
          col("ts_ns") <= col(prevCol) + lit(FunnelWindowNs))
        .groupBy(col("user_id")).agg(min(col("ts_ns")).as(outCol))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ns")).as("t1"))
    val t2 = firstAfter("click", t1, "t1", "t2")
    val t3 = firstAfter("purchase", t2.select(col("user_id"), col("t2")), "t2", "t3")
    val users = ev.select(col("user_id")).distinct()
    val total = users.agg(count(lit(1)).as("n_total"))
    users
      .join(t1, Seq("user_id"), "left_outer")
      .join(t2.select(col("user_id"), col("t2")), Seq("user_id"), "left_outer")
      .join(t3, Seq("user_id"), "left_outer")
      .withColumn("stage",
        when(col("t3").isNotNull, lit(3L))
          .when(col("t2").isNotNull, lit(2L))
          .when(col("t1").isNotNull, lit(1L))
          .otherwise(lit(0L)))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_users * 1000000 DIV n_total"))
      .select(col("stage"), col("n_users"), col("share_ppm"))
  }

  /** Retention cohort matrix (q98) — users grouped by first-seen epoch
    * day, activity counted per (cohort, day offset): the classic
    * product-analytics retention triangle, in its at-scale form. The
    * (user, day) activity grid is distinct-reduced FIRST (map-side
    * combine does most of the work), so the cohort join and both
    * aggregations run on at most users × days rows, never raw events;
    * cohort sizes are a broadcast. Epoch-day integers keep the matrix
    * hash-comparable across engines.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    val grid = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_ns DIV $dayNs").as("day"))
      .distinct()
    val cohort = grid.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    grid.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention_ppm", expr("n_active * 1000000 DIV n_cohort"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("retention_ppm"))
  }

  /** SCD type-2 history build (q112) — the classic warehouse operation:
    * collapse each user's event sequence into state intervals, one row
    * per run of equal `event_type`, with `[valid_from, valid_to]` in
    * event-time nanos and the open (current) interval carrying the
    * conventional high sentinel (Long.MaxValue, the engine-portable
    * analog of the 9999-12-31 high date). Two in-partition windows over
    * one user-keyed shuffle: lag to mark changes, running sum to number
    * runs, then lead over the collapsed runs for the interval ends —
    * the same no-state-machine shape as sessionization.
    */
  def scdIntervals(spark: SparkSession, dir: String): DataFrame = {
    // microsecond event time throughout: the interval bounds ride in the
    // result, and µs is the precision every engine agrees on (ns survives
    // only inside one engine) — so order, min, and lead all use the same
    // µs key both here and in the oracle
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val runs = Window.partitionBy(col("user_id")).orderBy(col("valid_from").asc)
    Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("chg")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(
        max(col("event_type")).as("state"), // constant within a run
        min(col("ts_us")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(runs) - 1L, lit(Long.MaxValue)))
      .withColumn("is_current",
        when(col("valid_to") === Long.MaxValue, 1L).otherwise(0L))
  }

  /** JSON field extraction from the `props` payload column, then a
    * grouped rollup on the extracted key. `get_json_object` is the
    * codegen'd built-in path (no UDF).
    */
  def jsonExtractAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS INT)"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  /** c²·10¹² for the KS critical value at α ≈ 0.05 (c = 1.36): the
    * test D > c·√((n_a+n_b)/(n_a·n_b)) squares to the all-integer
    * ks_ppm²·n_a·n_b > c²·10¹²·(n_a+n_b) — the sample-size-aware
    * significance test with no square root and no float, so the flag
    * is bit-stable cross-engine at every n.
    */
  val DriftKsCritSq1e12 = 1849600000000L

  /** Two-sample KS value-drift detector per event type (q143) — the
    * distribution-drift check a standing ingest runs between a
    * reference sample and fresh data ("did the value distribution
    * move?"), the numeric sibling of q92's token-TV divergence. The
    * two samples here are the deterministic even/odd `event_id` halves
    * (self-drift: a calibration reading that SHOULD be un-drifted — a
    * real deployment feeds yesterday/today). The statistic is the
    * classical KS distance, computed exactly in integer ppm:
    * D = max over observed values of |CDF_a − CDF_b|.
    *
    * Distributed shape: one aggregation to per-(type, value-cents)
    * counts — the relation is bounded by VALUE CARDINALITY per type,
    * not row count, which is what makes exact KS feasible at 100 TB —
    * then running/total sums as two window passes over the SAME
    * per-type partitioning (one shuffle), and a tiny per-type max. The
    * ppm arithmetic is DECIMAL(38,0)-widened like q94: cum·10⁶
    * overflows BIGINT past ~9.2e12 rows per type, and ANSI mode turns
    * that into an abort on one engine only.
    */
  def valueDriftKs(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(col("event_type"),
        (col("event_id") % 2 === 0).as("in_a"),
        cents(col("value")).as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("c_b"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = byType.orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum_a", sum(col("c_a")).over(cum))
      .withColumn("cum_b", sum(col("c_b")).over(cum))
      .withColumn("n_a", sum(col("c_a")).over(byType))
      .withColumn("n_b", sum(col("c_b")).over(byType))
      .withColumn("d_ppm", expr(
        "CAST(abs(CAST(cum_a AS DECIMAL(38,0)) * 1000000 DIV n_a - " +
          "CAST(cum_b AS DECIMAL(38,0)) * 1000000 DIV n_b) AS BIGINT)"))
      .groupBy(col("event_type"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("d_ppm")).as("ks_ppm"))
      // α≈0.05 significance, squared into integers (see the constant);
      // DECIMAL(38,0) holds ks_ppm²·n_a·n_b ≤ 10³⁶ at 10¹² rows/side
      .withColumn("drifted", expr(
        "CAST(ks_ppm AS DECIMAL(38,0)) * ks_ppm * n_a * n_b > " +
          s"CAST($DriftKsCritSq1e12 AS DECIMAL(38,0)) * (n_a + n_b)"))
  }

  /** Outlier threshold multiplier for [[valueOutliersMad]]: a value is an
    * outlier when |x − median| > [[MadK]] · MAD (the classical robust
    * z-score gate at k=3, without the 1.4826 normal-consistency constant
    * — the flag is a pure order-statistic rule, so it stays exact in
    * integers).
    */
  val MadK = 3L

  /** Robust per-type outlier gate via median/MAD, all in exact integers
    * (q146) — the numeric-anomaly sibling of the KS drift detector
    * (q143): where q143 asks "did the distribution move between two
    * samples?", this asks "which rows are anomalous against their own
    * group?", the gate a standing ingest uses to quarantine corrupt
    * amounts without letting the outliers themselves poison the
    * threshold (mean/stddev would; median/MAD do not).
    *
    * Exactness: medians interpolate at even counts, which would put a
    * float on the comparison boundary — instead every statistic is
    * DOUBLED and kept integral. `med2` = v_lo + v_hi where lo/hi are the
    * two middle order-statistic positions (equal when n is odd), so
    * med2 = 2·median exactly; deviations are measured as
    * dev2 = |2v − med2| (still integer cents), and `mad2` = 2·MAD in
    * dev2-units by the same two-position rule. The outlier test
    * dev > k·MAD becomes the all-integer 2·dev2 > k·mad2 — bit-stable
    * cross-engine with no float and no interpolation.
    *
    * Distributed shape (the q143 posture): every order statistic is
    * computed over the per-(type, value-cents) COUNT relation — bounded
    * by value cardinality, not row count — via one cumulative-sum window
    * per pass and a per-type min-search for the positions. The per-type
    * med2/mad2 relations are group-cardinality-sized and broadcast back;
    * no window ever runs over raw rows.
    */
  def valueOutliersMad(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .select(col("event_type"), cents(col("value")).as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("cnt"))

    // doubled weighted median of `vCol` (weight `cnt`) per event_type:
    // cumulative counts locate the two middle positions lo=(n+1) div 2,
    // hi=(n+2) div 2; the answer is v[lo] + v[hi] (one row counted twice
    // when n is odd).
    def doubledMedian(rel: DataFrame, vCol: String, out: String): DataFrame = {
      val byType = Window.partitionBy(col("event_type"))
      val cum = byType.orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rel
        .withColumn("cum", sum(col("cnt")).over(cum))
        .withColumn("n", sum(col("cnt")).over(byType))
        .groupBy(col("event_type"))
        .agg(
          min(when(col("cum") >= expr("(n + 1) DIV 2"), col(vCol))).as("v_lo"),
          min(when(col("cum") >= expr("(n + 2) DIV 2"), col(vCol))).as("v_hi"),
          max(col("n")).as("n"))
        .select(col("event_type"), (col("v_lo") + col("v_hi")).as(out),
          col("n"))
    }

    val med = doubledMedian(counts, "v_c", "med2_c")
    val dev = counts
      .join(broadcast(med.select(col("event_type"), col("med2_c"))),
        Seq("event_type"))
      .withColumn("dev2", abs(col("v_c") * 2L - col("med2_c")))
      .groupBy(col("event_type"), col("dev2"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = doubledMedian(dev, "dev2", "mad2_c")
      .select(col("event_type"), col("mad2_c"))

    dev
      .join(broadcast(mad), Seq("event_type"))
      .join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(col("med2_c")).as("med2_c"),
        max(col("mad2_c")).as("mad2_c"),
        sum(when(col("dev2") * 2L > lit(MadK) * col("mad2_c"), col("cnt"))
          .otherwise(0L)).as("n_outliers"))
      // DECIMAL(38,0)-widened like q143: n_outliers·10⁶ overflows BIGINT
      // past ~9.2e12 rows per type
      .withColumn("outlier_ppm", expr(
        "CAST(CAST(n_outliers AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)"))
  }

  /** Pattern window for [[cleanConversions]], in µs (1 hour). */
  val PatternWindowUs = 3600000000L

  /** q159: sequence-pattern detection WITH NEGATION — the
    * complex-event-processing contract (`MATCH_RECOGNIZE`'s core case)
    * that the funnel operators (q97/q103) cannot express: a `view`
    * converts CLEANLY iff a `purchase` follows within the window AND no
    * `error` lands strictly between them. Negation is the part that
    * makes this a distinct operator family — a join can find the
    * purchase, but "no error between" is a condition on the ABSENCE of
    * a row.
    *
    * One pass per user: both "first purchase after" and "first error
    * after" come from the same sort order via two range-frame window
    * aggregates (strictly-after lower bound, window-bounded upper) —
    * one shuffle, one sort, no self-join, no explode. µs-integer time
    * on both engines; −1 sentinels for absent events.
    *
    * Scale: the window frame is TIME-bounded, so per-row state is the
    * events inside one hour per user — the q59 rolling-sum class;
    * skew-bounded by per-user activity, linear in events.
    */
  def cleanConversions(spark: SparkSession, dir: String): DataFrame =
    cleanConversionsFor(Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("ts_us")))

  /** Core of [[cleanConversions]] over `(event_id, user_id, event_type,
    * ts_us)` — separated so boundary fixtures (exact-window purchase,
    * error at the purchase's microsecond) can drive it directly.
    */
  def cleanConversionsFor(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(1L, PatternWindowUs)
    ev
      .withColumn("p_ts_us",
        min(when(col("event_type") === "purchase", col("ts_us"))).over(w))
      .withColumn("e_ts_us",
        min(when(col("event_type") === "error", col("ts_us"))).over(w))
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_us"),
        coalesce(col("p_ts_us"), lit(-1L)).as("p_ts_us"),
        coalesce(col("e_ts_us"), lit(-1L)).as("e_ts_us"))
      .withColumn("converted_clean",
        col("p_ts_us") =!= -1L &&
          (col("e_ts_us") === -1L || col("e_ts_us") > col("p_ts_us")))
  }

  /** q164: behavioral anomaly scoring by TRANSITION RARITY — the
    * sequence-statistics operator (a first-order Markov view of the
    * event stream): learn the global transition distribution
    * p(from → to) in integer ppm, then score every user by how rare
    * their observed transitions are (Σ (10⁶ − p_ppm), plus the
    * per-transition mean). A user whose path keeps taking low-
    * probability edges floats to the top — fraud/bot detection's
    * simplest honest form, and deterministic end-to-end (float NLL is
    * not; the rarity sum is).
    *
    * Scale: one user-keyed shuffle for the sequence windows; the
    * transition model is TYPE²-sized and broadcasts back. Output is
    * user-dimension-sized.
    */
  def transitionRarity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns DIV 1000").as("ts_us"))
    // total order within user: (ts_us, event_id) — event_id is unique
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val trans = ev
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("user_id"), col("from_type"), col("event_type").as("to_type"))
    val model = trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(trans.agg(count(lit(1)).as("total"))))
      .select(col("from_type"), col("to_type"),
        expr("cnt * 1000000 DIV total").as("p_ppm"))
    trans.join(broadcast(model), Seq("from_type", "to_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(lit(1000000L) - col("p_ppm")).as("rarity_sum"))
      .withColumn("avg_rarity_ppm", expr("rarity_sum DIV n_trans"))
  }

  /** Half-life of [[decayedActivity]], in days: weights halve every
    * [[DecayHalfLifeDays]] days of age — as an integer right-shift, so
    * the decay curve is exact on both engines.
    */
  val DecayHalfLifeDays = 7L

  /** q160: recency-decay-weighted user activity — the
    * feature-engineering aggregate behind "recent engagement" signals:
    * each event contributes `value_cents >> (age_days div 7)` (halving
    * per week of age, age measured from the corpus max timestamp).
    * Exponential decay with float weights is not replayable; the shift
    * form is bit-exact and keeps map-side partial aggregation (one
    * scan, one user-keyed shuffle, the 1-row reference attach
    * broadcast).
    */
  def decayedActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
        cents(col("value")).as("value_c"))
    val ref = ev.agg(max(col("ts_us")).as("ref_us"))
    ev.crossJoin(broadcast(ref))
      .withColumn("shift", expr(
        s"least((ref_us - ts_us) DIV ${86400000000L * DecayHalfLifeDays}, 62)"))
      .withColumn("w_c", expr("shiftright(value_c, CAST(shift AS INT))"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_c")).as("raw_c"),
        sum(col("w_c")).as("decayed_c"))
  }

  /** Trailing-window length (days) for the q210 rolling-actives panel. */
  val ActiveWindowDays = 7

  /** Rolling 7-day active users per day (q210) — the WAU/DAU
    * engagement panel: for every day up to the corpus horizon, the
    * EXACT count of users active in the trailing [[ActiveWindowDays]]
    * days, alongside that day's 1-day actives. Sliding distinct counts
    * do NOT decompose (7-day actives ≠ sum of dailies), which is what
    * makes this its own operator rather than a window over q21.
    *
    * Spark-first shape: dedupe to the (user, day) grid (≪ events),
    * then CONTRIBUTE each activity day to the ≤ [[ActiveWindowDays]]
    * windows it can serve via an integer `sequence` explode — a
    * constant-bounded expansion of the grid, NOT of the fact table —
    * dedupe (user, window) and count per window. Two keyed shuffles
    * over grid-sized relations; the only broadcast is the 1-row
    * horizon; no corpus-wide window function, no per-day rescan. The
    * same plan holds at 100 TB because the expansion factor is the
    * window length, independent of data volume.
    */
  def rollingActives(spark: SparkSession, dir: String): DataFrame =
    rollingActivesFor(Tables.events(spark, dir))

  def rollingActivesFor(events: DataFrame): DataFrame = {
    val dayNs = 86400000000000L
    val grid = events
      .select(col("user_id"), expr(s"ts_ns DIV $dayNs").as("day"))
      .distinct()
    val horizon = grid.agg(max(col("day")).as("max_day"))
    val windows = grid
      .select(col("user_id"),
        explode(expr(s"sequence(day, day + ${ActiveWindowDays - 1})"))
          .as("day"))
      .crossJoin(broadcast(horizon))
      .filter(col("day") <= col("max_day"))
      .select(col("user_id"), col("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_active_7d"))
    val daily = grid.groupBy(col("day")).agg(count(lit(1)).as("n_active_1d"))
    windows.join(daily, Seq("day"), "left_outer")
      .na.fill(0L, Seq("n_active_1d"))
  }

  /** Consecutive-day activity streaks (q211) — the gaps-and-islands
    * shape, distinct from q46's time-gap sessionization: islands live
    * on the CALENDAR grid (a streak breaks when a whole day is
    * missed), found with the classic day − row_number() constant-key
    * trick, no gap parameter and no lag comparison chain. Output is
    * the streak-length histogram: how many maximal streaks of each
    * length exist and how many users own one — the habit-formation
    * panel engagement teams read weekly.
    *
    * Scale: one user-keyed shuffle for the in-partition window over
    * the deduped (user, day) grid, then a histogram aggregation on the
    * streak relation (≤ grid-sized). No corpus-wide window, no joins.
    */
  def dayStreaks(spark: SparkSession, dir: String): DataFrame =
    dayStreaksFor(Tables.events(spark, dir))

  def dayStreaksFor(events: DataFrame): DataFrame = {
    val dayNs = 86400000000000L
    val grid = events
      .select(col("user_id"), expr(s"ts_ns DIV $dayNs").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    grid
      .withColumn("isl", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("streak_len"))
      .groupBy(col("streak_len"))
      .agg(count(lit(1)).as("n_streaks"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Event types that define the SCD state in [[pitEnrichment]]. */
  val PitStateTypes = Seq("signup", "purchase", "error")

  /** Point-in-time enrichment (q190) — the AS-OF consumption of q112's
    * SCD intervals: every interaction fact (view/click) is enriched
    * with the state its user was in AT THAT MOMENT (the latest
    * state-defining event at or before the fact), then rolled up per
    * (state, fact type) with exact cents.
    *
    * Spark-first shape: because facts and the state dimension derive
    * from the SAME user-keyed stream, the PIT join needs NO join at
    * all — union the two roles and forward-fill the state with
    * `last(ignoreNulls)` over the (ts, event_id)-ordered per-user
    * window (the q27 idiom). One shuffle on user_id, no interval
    * explosion, no range join; the binned-range-join machinery (q110)
    * stays reserved for PIT against a FOREIGN dimension. Facts before
    * any state event surface as state NULL — the auditable "no
    * dimension row yet" bucket, exactly what a left range join yields.
    */
  def pitEnrichment(spark: SparkSession, dir: String): DataFrame =
    pitEnrichmentFor(Tables.events(spark, dir))

  def pitEnrichmentFor(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("ts_us", expr("ts_ns DIV 1000"))
      .withColumn("state_evt",
        when(col("event_type").isin(PitStateTypes: _*), col("event_type")))
      .withColumn("state",
        last(col("state_evt"), ignoreNulls = true).over(byUser))
      .filter(col("event_type").isin("view", "click"))
      .groupBy(col("state"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_c"))
  }

  /** q233: Kaplan–Meier survival over user lifetimes (Kaplan & Meier
    * 1958) — the censoring-aware churn curve q98's retention matrix
    * cannot give: a user whose last event falls on the corpus's final
    * observed day has not churned, only left observation, and counting
    * them as dead biases every lifetime estimate downward. Lifetime =
    * last − first active day; death = lifetime ended before the
    * horizon; right-censored otherwise.
    *
    * Exact contract (both engines replay it): per distinct lifetime t
    * (ascending), n_risk = users with lifetime ≥ t, d = deaths at t,
    * c = censored at t, hazard_ppm = d·10⁶ div n_risk, and the KM
    * product survival_ppm = fold over rows ≤ t of
    * `s ← (s · (n_risk − d)) div n_risk` from s = 10⁶ — the floor
    * applied AT EACH STEP, so the sequential fold is the contract
    * (DuckDB replays it as a recursive CTE; Spark as one `aggregate`
    * lambda over the sorted curve array).
    *
    * Scale: one user-keyed aggregation (first/last day) collapses the
    * corpus; everything after runs on the HORIZON-bounded lifetime
    * relation (≤ observed days), where the suffix-sum window and the
    * fold cost nothing at any corpus size.
    */
  /** Lateness quantiles reported by [[watermarkTuning]] (percent). */
  val WatermarkQuantiles: Seq[Long] = Seq(50L, 90L, 95L, 99L, 100L)

  /** q238: the out-of-orderness profile that PICKS the watermark delay
    * every streaming query in the engine must declare (q21 windows,
    * q133/q152/q167 joins, q147 sessions, q163 screens): per event,
    * lateness = running event-time max in ARRIVAL order (event_id
    * within user) minus the event's own time — how late this event
    * was, relative to what had already been seen — then the exact
    * lateness quantiles ([[WatermarkQuantiles]]) plus the out-of-order
    * share. Set the delay at p99 and q152's state bound follows; set
    * it at p50 and half the late events are dropped — this panel is
    * the measurement that decision reads.
    *
    * Scale: one user-keyed window pass (the sessionize shuffle), then
    * exact order statistics from the LATENESS-VALUE histogram (the
    * q71/q204 rank rule) — never a corpus-scale sort.
    */
  def watermarkTuning(spark: SparkSession, dir: String): DataFrame =
    watermarkTuningFor(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns")))

  def watermarkTuningFor(ev: DataFrame): DataFrame = {
    val wArr = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lateness = ev
      .withColumn("run_max", max(col("ts_ns")).over(wArr))
      .select(expr("(run_max - ts_ns) DIV 1000000").as("late_ms"))
    val hist = lateness.groupBy(col("late_ms")).agg(count(lit(1)).as("cnt"))
    val byV = Window.orderBy(col("late_ms"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("n_late", sum(when(col("late_ms") > 0L, col("cnt"))
        .otherwise(0L)).over(Window.partitionBy()))
    val positions = cum.select(col("tot")).distinct()
      .select(col("tot"),
        explode(expr(s"array(${WatermarkQuantiles.mkString("L, ")}L)"))
          .as("quantile"))
      .select(col("quantile"),
        expr("(tot - 1) * quantile DIV 100 + 1").as("pos"))
    cum.join(broadcast(positions), col("cum") >= col("pos"))
      .groupBy(col("quantile"))
      .agg(min(col("late_ms")).as("late_ms"),
        max(col("tot")).as("n_events"),
        max(col("n_late")).as("n_ooo"),
        expr("max(n_late) * 1000000 DIV max(tot)").as("ooo_ppm"))
  }

  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    kaplanMeierFor(Tables.events(spark, dir)
      .select(col("user_id"), expr(s"ts_ns DIV $dayNs").as("day")))
  }

  /** [[kaplanMeier]]'s algebra over an explicit (user_id, day)
    * activity relation — fixture-testable.
    */
  def kaplanMeierFor(activity: DataFrame): DataFrame = {
    val lives = activity
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
    val horizon = lives.agg(max(col("ld")).as("m"))
    val durs = lives.crossJoin(broadcast(horizon))
      .select((col("ld") - col("fd")).as("t"),
        when(col("ld") < col("m"), 1L).otherwise(0L).as("death"))
      .groupBy(col("t"))
      .agg(sum(col("death")).as("d"),
        sum(lit(1L) - col("death")).as("c"),
        count(lit(1)).as("n_at"))
    val wSuffix = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = durs
      .withColumn("n_risk", sum(col("n_at")).over(wSuffix))
      .select(col("t"), col("n_risk"), col("d"), col("c"))
    curve
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("d"), col("c")))).as("rows"))
      .select(explode(expr(
        """aggregate(rows,
          |  CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
          |    d: BIGINT, c: BIGINT, s: BIGINT>>),
          |  (acc, x) -> acc || array(struct(x.t AS t, x.n_risk AS n_risk,
          |    x.d AS d, x.c AS c,
          |    (IF(size(acc) = 0, 1000000L, element_at(acc, -1).s)
          |      * (x.n_risk - x.d)) DIV x.n_risk AS s)))""".stripMargin))
        .as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d").as("d"), col("r.c").as("c"),
        expr("r.d * 1000000 DIV r.n_risk").as("hazard_ppm"),
        col("r.s").as("survival_ppm"))
  }
}
