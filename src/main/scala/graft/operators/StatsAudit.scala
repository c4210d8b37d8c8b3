package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Statistical data-audit operators beyond distribution drift (q143's
  * KS statistic, q146's MAD outliers): change-POINT localization and
  * digit-law conformance — the two checks a curation pipeline runs
  * when a monitored aggregate moves and the question becomes WHEN did
  * it move and IS the raw data fabricated/truncated.
  *
  * Both follow the repo's exactness discipline: money per row in
  * integer cents, sums widened to DECIMAL(38), every division a
  * truncating integral divide on identical operands in both engines.
  */
object StatsAudit {

  /** CUSUM changepoint trajectory (q179) over daily order revenue —
    * Page's cumulative-sum statistic in exact scaled-integer form:
    * with daily revenues x₁..xₙ (cents) and S_t = Σ_{i≤t} x_i, the
    * scaled deviation C_t = n·S_t − t·S_n equals n·Σ(x_i − μ), so its
    * extremum localizes the level shift WITHOUT ever forming the
    * non-integer mean μ. Output: one row per day — position, day,
    * revenue, C_t DIV n (back on the cents scale), and a peak flag on
    * every row attaining the maximum |C_t|.
    *
    * Scale: the corpus collapses to the DAY-bounded daily relation in
    * one partial-aggregated pass; the prefix/extremum windows run over
    * that metadata-sized relation (a few thousand rows per decade of
    * data), so the global window is not a corpus-scale sort. Products
    * n·S_t are DECIMAL(38)-widened — cents totals stay inside the
    * accumulator far past 10¹²-row fact tables.
    */
  def revenueCusum(spark: SparkSession, dir: String): DataFrame =
    revenueCusumFor(Tables.orders(spark, dir))

  def revenueCusumFor(orders: DataFrame): DataFrame = {
    val daily = orders
      // NTZ → (UTC session) TIMESTAMP → epoch seconds, the repo's
      // standard epoch projection for timestamp columns
      .select(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
        .as("day"),
        Determinism.cents(col("o_totalprice")).as("xc"))
      .groupBy(col("day")).agg(sum(col("xc")).as("x_c"))
    val w = Window.orderBy(col("day"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    daily
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("prefix", sum(col("x_c")).over(cum))
      .withColumn("n_days", count(lit(1)).over(all))
      .withColumn("total", sum(col("x_c")).over(all))
      .withColumn("cusum_c", expr(
        "CAST((CAST(n_days AS DECIMAL(38,0)) * prefix - " +
          "CAST(t AS DECIMAL(38,0)) * total) DIV n_days AS BIGINT)"))
      .withColumn("peak_abs", max(abs(col("cusum_c"))).over(all))
      .select(col("t"), col("day"), col("x_c"), col("cusum_c"),
        (abs(col("cusum_c")) === col("peak_abs")).as("is_peak"))
  }

  /** Benford first-digit expectations, floor(log₁₀(1 + 1/d)·10⁶) ppm —
    * ONE definition injected into both the Spark literal table and the
    * oracle SQL so the constants cannot drift.
    */
  val BenfordPpm: Seq[(Int, Long)] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1000000.0).toLong)

  /** Benford first-digit conformance audit (q180) on lineitem extended
    * prices — the fabrication/truncation screen: natural multi-scale
    * amounts follow log-uniform first digits; uniform or hand-typed
    * data does not. Output per digit: observed count and ppm share,
    * the Benford expectation, and the signed deviation. (TPC-H-shaped
    * prices are NOT Benford-distributed — uniform quantity × price —
    * so the fixture exercises a failing audit, which is the
    * informative direction.)
    *
    * Scale: one partial-aggregated pass to nine digit groups plus a
    * 9-row broadcast of the expectation table. Nothing else.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame =
    benfordAuditFor(Tables.lineitem(spark, dir))

  def benfordAuditFor(li: DataFrame): DataFrame = {
    val exp9 = li.sparkSession.createDataFrame(
      BenfordPpm.map { case (d, p) => (d.toLong, p) })
      .toDF("digit", "exp_ppm")
    val obs = li
      .select(Determinism.cents(col("l_extendedprice")).as("c"))
      .filter(col("c") > 0L)
      .select(expr("CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = obs.agg(sum(col("n")).as("n_total"))
    obs.join(broadcast(exp9), Seq("digit"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * 1000000 DIV n_total AS BIGINT)")
          .as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** Per-nation OLS revenue trend (q185) — the regression third of the
    * statistical-audit family (localization q179, conformance q180):
    * least-squares slope, intercept, and r² of monthly order revenue
    * against the month index, via the NORMAL EQUATIONS in exact
    * integer arithmetic — slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) — never a
    * floating accumulator, so the result is bit-identical under any
    * partitioning and in the oracle.
    *
    * Scale: one fact pass partial-aggregates to the (nation × month)
    * relation — dimension-bounded (25 nations × ~84 months) — and all
    * window-free regression algebra runs there. y is quantized to
    * whole DOLLARS (cents DIV 100) for accumulator headroom: Σy² is
    * DECIMAL(38)-widened and stays exact past 10¹²-row fact tables
    * (documented bound: exact while n·Σy² < 10³²). r² reorders the
    * textbook (nΣxy−ΣxΣy)²·10⁶/(den_x·den_y) as ((num·10⁶ DIV
    * den_x)·num) DIV den_y — same value, but Cauchy–Schwarz then
    * bounds every intermediate by 10⁶·den_y, dodging the num² blowup.
    */
  /** Day boundary splitting the pre-period (covariate window) from the
    * experiment window in [[cupedAdjust]] / [[abProportionTest]]: the
    * events corpus spans one month, so day-of-month 15 halves it.
    */
  val AbSplitDay = 15

  /** Conversion bar for the q202 proportion test: a post-period
    * purchase above this many cents (every user purchases SOMETHING in
    * the synthetic corpus, so plain did-purchase is degenerate).
    */
  val ConvertCentsMin = 9000L

  /** Hash split for variant assignment: bucket < 500000 ppm → "A". */
  private def variantCol = when(
    expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(" +
      "concat(CAST(user_id AS STRING), '#ab'), 8) % 1000000") < 500000L,
    "A").otherwise("B")

  /** Per-user pre/post value sums and hash variant, shared by the
    * experimentation pair (q201/q202).
    */
  private def abUsers(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        expr(s"CAST(dayofmonth(CAST(ts_ns DIV 1000000000 AS TIMESTAMP)) " +
          s"< $AbSplitDay AS LONG)").as("pre"),
        Determinism.cents(col("value")).as("v_c"),
        (col("event_type") === "purchase").cast("long").as("is_purchase"))
      .groupBy(col("user_id"))
      .agg(sum(expr("pre * v_c")).as("x_c"),
        sum(expr("(1 - pre) * v_c")).as("y_c"),
        max(expr(s"(1 - pre) * is_purchase * " +
          s"CAST(v_c > $ConvertCentsMin AS LONG)")).as("converted"))
      .withColumn("variant", variantCol)

  /** CUPED-adjusted experiment readout (q201) — the variance-reduction
    * workhorse of every experimentation platform (Deng et al. 2013):
    * each user's experiment-window metric y is adjusted by their
    * PRE-period covariate x, ŷ = y − θ(x − x̄), with θ = cov(x,y)/var(x)
    * pooled across variants. Same exact-integer normal-equation algebra
    * as q185 (θ and the variance-reduction ρ² in ppm, Cauchy–Schwarz-
    * bounded r² reorder); the adjusted means are exact nested integer
    * divisions mirrored in the oracle. Output: one row per hash-split
    * variant with raw and adjusted means plus the shared θ/ρ².
    *
    * Scale: one fact pass to per-user sums (user-keyed partial agg),
    * then user-bounded aggregations; the 1-row pooled stats broadcast.
    */
  def cupedAdjust(spark: SparkSession, dir: String): DataFrame =
    cupedAdjustFor(Tables.events(spark, dir))

  def cupedAdjustFor(events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
    val users = abUsers(events)
    val pooled = users.agg(count(lit(1)).as("n_all"),
      sum(col("x_c")).as("sx"), sum(col("y_c")).as("sy"),
      sum(expr("CAST(x_c AS DECIMAL(38,0)) * x_c")).as("sxx"),
      sum(expr("CAST(x_c AS DECIMAL(38,0)) * y_c")).as("sxy"),
      sum(expr("CAST(y_c AS DECIMAL(38,0)) * y_c")).as("syy"))
      .withColumn("num",
        expr("CAST(n_all AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den_x",
        expr("CAST(n_all AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("den_y",
        expr("CAST(n_all AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .withColumn("theta_ppm",
        expr("CASE WHEN den_x = 0 THEN 0 " +
          "ELSE CAST(num * 1000000 DIV den_x AS BIGINT) END"))
      .withColumn("rho2_ppm",
        expr("CASE WHEN den_x = 0 OR den_y = 0 THEN 0 " +
          "ELSE CAST(((num * 1000000 DIV den_x) * num) DIV den_y AS BIGINT) END"))
    users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x_c")).as("sx_v"), sum(col("y_c")).as("sy_v"))
      .crossJoin(broadcast(pooled.select(col("n_all"), col("sx"),
        col("theta_ppm"), col("rho2_ppm"))))
      .select(col("variant"), col("n_users"),
        expr("CAST(CAST(sy_v AS DECIMAL(38,0)) * 1000000 DIV n_users AS BIGINT)")
          .as("y_mean_ppm"),
        expr("CAST(CAST(sy_v AS DECIMAL(38,0)) * 1000000 DIV n_users AS BIGINT) - " +
          "theta_ppm * (CAST(CAST(sx_v AS DECIMAL(38,0)) * 1000000 DIV n_users AS BIGINT) - " +
          "CAST(CAST(sx AS DECIMAL(38,0)) * 1000000 DIV n_all AS BIGINT)) DIV 1000000")
          .as("adj_mean_ppm"),
        col("theta_ppm"), col("rho2_ppm"))
  }

  /** χ²(1) critical value at α = 0.05, floor-scaled to ppm — shared
    * with the q202 oracle so the constant cannot drift.
    */
  val Chi2Crit05Ppm = 3841458L

  /** Two-proportion z-test panel (q202) — the significance readout for
    * a conversion experiment, in the repo's exact-integer discipline:
    * z² = (c₁n₂ − c₂n₁)²·n / (n₁·n₂·c·(n−c)) — the algebraic identity
    * of the pooled two-proportion z statistic squared, so the
    * significance cut is z²_ppm > [[Chi2Crit05Ppm]] with no square
    * root and no float variance. Degenerate pools (c = 0 or c = n)
    * yield NULL and no flag.
    *
    * Scale: rides [[abUsers]]'s one fact pass; everything after is a
    * 2-row aggregation.
    */
  def abProportionTest(spark: SparkSession, dir: String): DataFrame =
    abProportionTestFor(Tables.events(spark, dir))

  def abProportionTestFor(events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
    val byVariant = abUsers(events)
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"), sum(col("converted")).as("c_v"))
    val a = byVariant.filter(col("variant") === "A")
      .select(col("n_v").as("n1"), col("c_v").as("c1"))
    val b = byVariant.filter(col("variant") === "B")
      .select(col("n_v").as("n2"), col("c_v").as("c2"))
    a.crossJoin(broadcast(b))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("c", col("c1") + col("c2"))
      .withColumn("z2_ppm", expr(
        "CASE WHEN c = 0 OR c = n THEN NULL ELSE CAST(" +
          "(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1) * " +
          "(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1) * " +
          "n * 1000000 DIV (CAST(n1 AS DECIMAL(38,0)) * n2 * c * (n - c)) " +
          "AS BIGINT) END"))
      .select(col("n1"), col("c1"), col("n2"), col("c2"),
        expr("c1 * 1000000 DIV n1").as("p1_ppm"),
        expr("c2 * 1000000 DIV n2").as("p2_ppm"),
        col("z2_ppm"),
        expr(s"CASE WHEN z2_ppm IS NULL THEN false " +
          s"ELSE z2_ppm > $Chi2Crit05Ppm END").as("significant"))
  }

  /** Poisson(1) CDF thresholds in floor-ppm (weight w for hash-uniform
    * u: the smallest k with u < P(X ≤ k)·10⁶) — ONE table injected
    * into both engines, the BenfordPpm pattern.
    */
  val PoissonCdfPpm: Seq[Long] = {
    // P(X ≤ k) = e⁻¹ · Σ_{i≤k} 1/i!
    val fact = (0 to 8).scanLeft(1L)((a, i) => if (i == 0) 1L else a * i).tail
    (0 to 8).map { k =>
      val s = (0 to k).map(i => 1.0 / fact(i)).sum
      math.floor(math.exp(-1.0) * s * 1000000.0).toLong
    }
  }

  /** Bootstrap resample count for [[bootstrapMeans]]. */
  val BootstrapB = 32

  /** Deterministic Poisson-bootstrap panel (q203) — confidence
    * machinery without a random number generator: each of
    * [[BootstrapB]] resamples weights every day by a Poisson(1) draw
    * DERIVED from a salted hash against the shared [[PoissonCdfPpm]]
    * thresholds (deterministic, partition-invariant, oracle-
    * replayable — the md5-bucket discipline applied to resampling).
    * Output: one row per resample with its effective mass and mean
    * daily revenue; the spread of the 32 means IS the bootstrap CI of
    * the mean, read off by rank.
    *
    * Scale: the q179 posture — facts collapse to the day relation
    * once; the B-fold explode runs on days × B (metadata-sized).
    */
  def bootstrapMeans(spark: SparkSession, dir: String): DataFrame =
    bootstrapMeansFor(Tables.orders(spark, dir))

  def bootstrapMeansFor(orders: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(orders.sparkSession)
    val fn = graft.functions.GraftFunctions.Md5PrefixName
    val daily = orders
      .select(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
        .as("day"),
        Determinism.cents(col("o_totalprice")).as("xc"))
      .groupBy(col("day")).agg(sum(col("xc")).as("x_c"))
    val wExpr = PoissonCdfPpm.zipWithIndex.reverse
      .foldLeft("9") { case (acc, (thr, k)) =>
        s"CASE WHEN u < $thr THEN $k ELSE $acc END"
      }
    daily
      .select(col("day"), col("x_c"),
        explode(sequence(lit(0L), lit(BootstrapB - 1L))).as("b"))
      .withColumn("u", expr(
        s"$fn(concat(CAST(day AS STRING), '#bs', CAST(b AS STRING)), 8) " +
          "% 1000000"))
      .withColumn("w", expr(s"CAST(($wExpr) AS BIGINT)"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(expr("w * x_c")).as("mass_c"))
      .select(col("b"), col("n_eff"),
        expr("CASE WHEN n_eff = 0 THEN NULL " +
          "ELSE CAST(CAST(mass_c AS DECIMAL(38,0)) DIV n_eff AS BIGINT) END")
          .as("mean_c"))
  }

  /** Rolling window (days) and band width (k sigmas) for [[bandBreach]]. */
  val BandWindowDays = 7
  val BandK = 2L

  /** Rolling band-breach detection (q200) — the control-chart sibling
    * of q179's CUSUM: flag days whose revenue leaves the ±k·σ band of
    * their own trailing [[BandWindowDays]]-row window (Bollinger/3-σ
    * rule, k = [[BandK]]). Exact integers throughout by comparing
    * SQUARES: z² = (x·n − S)²/(n·Q − S²) with S = Σx, Q = Σx² over the
    * window, so breach ⟺ z²_ppm > k²·10⁶ — no square root, no float σ.
    * A zero-variance window yields NULL z² and no breach.
    *
    * Scale: the q179 posture — one partial-aggregated fact pass to the
    * day-bounded daily relation; the rolling window runs there
    * (metadata-sized), never over facts. Products DECIMAL(38)-widened:
    * (x·n)² stays exact past 10¹³-cent days.
    */
  def bandBreach(spark: SparkSession, dir: String): DataFrame =
    bandBreachFor(Tables.orders(spark, dir))

  def bandBreachFor(orders: DataFrame): DataFrame = {
    val daily = orders
      .select(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
        .as("day"),
        Determinism.cents(col("o_totalprice")).as("xc"))
      .groupBy(col("day")).agg(sum(col("xc")).as("x_c"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(-(BandWindowDays - 1), Window.currentRow)
    daily
      .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("s_w", sum(col("x_c")).over(w))
      .withColumn("q_w", sum(expr("CAST(x_c AS DECIMAL(38,0)) * x_c")).over(w))
      .withColumn("num",
        expr("CAST(x_c AS DECIMAL(38,0)) * n_w - s_w"))
      .withColumn("den",
        expr("CAST(n_w AS DECIMAL(38,0)) * q_w - CAST(s_w AS DECIMAL(38,0)) * s_w"))
      .select(col("t"), col("day"), col("x_c"),
        expr("CASE WHEN den = 0 THEN NULL " +
          "ELSE CAST(num * num * 1000000 DIV den AS BIGINT) END").as("z2_ppm"),
        expr(s"CASE WHEN den = 0 THEN false " +
          s"ELSE CAST(num * num * 1000000 DIV den AS BIGINT) > " +
          s"${BandK * BandK * 1000000L} END").as("breach"))
  }

  /** Outlier multiple for [[seasonalResiduals]]: flag dev > K·MAD. */
  val SeasonalMadK = 3L

  /** Weekday-seasonal residual outliers (q215) — the seasonal
    * completion of the anomaly family (CUSUM q179 finds level SHIFTS,
    * band-breach q200 trailing-window excursions, MAD q146 global
    * outliers): daily revenue is compared against its OWN WEEKDAY's
    * median, so a quiet Sunday is not an anomaly and a Sunday-sized
    * Tuesday is. Residuals are doubled-median exact integers (the q146
    * trick: med2 = v_lo + v_hi, no halving, no floats), the flag is
    * dev > [[SeasonalMadK]]·MAD on the same doubled scale
    * (2·dev2 > K·mad4, since dev2 = 2·dev and mad4 = 4·MAD).
    *
    * Scale: the q179 posture — one partial-aggregated fact pass to the
    * day-bounded daily relation; weekday medians are windows over that
    * CALENDAR-bounded relation (days grow with time, not volume), and
    * the per-dow median/MAD relations broadcast at 7 rows.
    */
  def seasonalResiduals(spark: SparkSession, dir: String): DataFrame =
    seasonalResidualsFor(Tables.orders(spark, dir))

  def seasonalResidualsFor(orders: DataFrame): DataFrame = {
    val daily = orders
      .select(expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) DIV 86400")
        .as("day"),
        Determinism.cents(col("o_totalprice")).as("xc"))
      .groupBy(col("day")).agg(sum(col("xc")).as("x_c"))
      // day 0 = 1970-01-01, a Thursday: +3 makes 0 = Monday
      .withColumn("dow", expr("(day + 3) % 7"))
    val byDow = Window.partitionBy(col("dow"))
    def doubled2(rel: DataFrame, vCol: String, out: String): DataFrame =
      rel
        .withColumn("rn", row_number().over(
          byDow.orderBy(col(vCol), col("day"))).cast("long"))
        .withColumn("n", count(lit(1)).over(byDow))
        .groupBy(col("dow"))
        .agg((min(when(col("rn") === expr("(n + 1) DIV 2"), col(vCol))) +
          min(when(col("rn") === expr("(n + 2) DIV 2"), col(vCol))))
          .as(out))
    val med = doubled2(daily, "x_c", "med2_c")
    val dev = daily.join(broadcast(med), Seq("dow"))
      .withColumn("dev2_c", abs(col("x_c") * 2L - col("med2_c")))
    val mad = doubled2(dev, "dev2_c", "mad4_c")
    dev.join(broadcast(mad), Seq("dow"))
      .select(col("day"), col("dow"), col("x_c"), col("med2_c"),
        (col("x_c") * 2L - col("med2_c")).as("resid2_c"),
        (col("dev2_c") * 2L > lit(SeasonalMadK) * col("mad4_c"))
          .as("is_outlier"))
  }

  /** Categorical-drift contingency audit (q191) — the independence
    * check of the statistical family: does the order-priority MIX
    * drift across years? Observed vs expected cell shares of the
    * (year × priority) contingency table, plus each cell's
    * mean-square-contingency contribution — φ² per cell scaled to ppm,
    * (obs_ppm − exp_ppm)² DIV exp_ppm, whose sum is χ²/n · 10⁶. The
    * statistic is DEFINED by this integer formula (the repo's q92-TV
    * discipline: a deterministic drift score, not a float p-value), so
    * both engines hash-match bit-exactly at any scale; working in ppm
    * SHARES rather than raw counts keeps every intermediate ≤ 10¹²
    * where the textbook (O·n − row·col)² overflows even HUGEINT on
    * 10¹²-row tables.
    *
    * Scale: one partial-aggregated fact pass to the (years × 5)-cell
    * relation; marginals and the grand total are metadata-sized
    * broadcasts.
    */
  def priorityDriftCells(spark: SparkSession, dir: String): DataFrame =
    priorityDriftCellsFor(Tables.orders(spark, dir))

  def priorityDriftCellsFor(orders: DataFrame): DataFrame = {
    val cells = orders
      .select(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        col("o_orderpriority").as("priority"))
      .groupBy(col("yr"), col("priority"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col("yr")).agg(sum(col("o")).as("row_tot"))
    val colTot = cells.groupBy(col("priority")).agg(sum(col("o")).as("col_tot"))
    val tot = cells.agg(sum(col("o")).as("n_tot"))
    cells
      .join(broadcast(rowTot), Seq("yr"))
      .join(broadcast(colTot), Seq("priority"))
      .crossJoin(broadcast(tot))
      .withColumn("obs_ppm",
        expr("CAST(CAST(o AS DECIMAL(38,0)) * 1000000 DIV n_tot AS BIGINT)"))
      .withColumn("exp_ppm", expr(
        "CAST(CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000000 " +
          "DIV (CAST(n_tot AS DECIMAL(38,0)) * n_tot) AS BIGINT)"))
      .withColumn("phi2_cell_ppm", expr(
        "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) " +
          "DIV greatest(exp_ppm, CAST(1 AS BIGINT))"))
      .select(col("yr"), col("priority"), col("o"), col("row_tot"),
        col("col_tot"), col("obs_ppm"), col("exp_ppm"), col("phi2_cell_ppm"))
  }

  def revenueTrend(spark: SparkSession, dir: String): DataFrame =
    revenueTrendFor(Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir))

  def revenueTrendFor(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame = {
    val monthly = orders
      .select(col("o_custkey"),
        expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)")
          .as("m"),
        Determinism.cents(col("o_totalprice")).as("yc"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("m"))
      .agg(expr("sum(yc) DIV 100").as("y"))
    val sums = monthly
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("m")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("m * m")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("num",
        expr("CAST(n_months AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den_x",
        expr("CAST(n_months AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("den_y",
        expr("CAST(n_months AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
    sums
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_months"), col("sy").as("total_dollars"),
        expr("CASE WHEN den_x = 0 THEN NULL " +
          "ELSE CAST(num * 1000000 DIV den_x AS BIGINT) END").as("slope_ppm"),
        expr("CASE WHEN den_x = 0 THEN NULL ELSE CAST((CAST(sy AS DECIMAL(38,0)) " +
          "* sxx - CAST(sx AS DECIMAL(38,0)) * sxy) * 1000000 DIV den_x AS BIGINT) " +
          "END").as("intercept_ppm"),
        expr("CASE WHEN den_x = 0 OR den_y = 0 THEN NULL " +
          "ELSE CAST(((num * 1000000 DIV den_x) * num) DIV den_y AS BIGINT) END")
          .as("r2_ppm"))
  }

  /** Number of synthetic A/A splits the q239 calibration runs. */
  val AaSplits = 20

  /** q239: A/A null calibration — the check every experimentation
    * platform runs BEFORE trusting its significance machinery (q202):
    * assign the same users to [[AaSplits]] different no-treatment
    * splits (independent salted hashes), run the identical z² test on
    * each, and read how often the null is rejected. A healthy stack
    * rejects ≈ α·K (1 of 20 at α = 0.05); systematic inflation means
    * the assignment, the metric, or the variance is broken — and every
    * "significant" experiment readout is suspect. Deterministic: the
    * hash splits are fixed, so the panel is a regression gate, not a
    * Monte-Carlo run.
    *
    * Scale: ONE fact pass to the per-user converted relation (shared
    * with q201/q202), a K-way explode of the USER relation (not the
    * fact table), and K 4-number aggregations.
    */
  def aaCalibration(spark: SparkSession, dir: String): DataFrame =
    aaCalibrationFor(Tables.events(spark, dir))

  def aaCalibrationFor(events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
    val fp = graft.functions.GraftFunctions.Md5PrefixName
    val per = abUsers(events).select(col("user_id"), col("converted"))
      .select(col("user_id"), col("converted"),
        explode(expr(s"sequence(0, ${AaSplits - 1})")).as("split_id"))
      .withColumn("is_a", expr(
        s"$fp(concat(CAST(user_id AS STRING), '#aa', " +
          s"CAST(split_id AS STRING)), 8) % 1000000") < 500000L)
      .groupBy(col("split_id"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("is_a"), col("converted")).otherwise(0L)).as("c1"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("is_a"), col("converted")).otherwise(0L)).as("c2"))
    per
      .withColumn("z2_ppm", expr(
        "CASE WHEN c1 + c2 = 0 OR c1 + c2 = n1 + n2 THEN NULL ELSE CAST(" +
          "(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1) * " +
          "(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1) * " +
          "(n1 + n2) * 1000000 DIV (CAST(n1 AS DECIMAL(38,0)) * n2 * " +
          "(c1 + c2) * (n1 + n2 - c1 - c2)) AS BIGINT) END"))
      .select(col("split_id").cast("long").as("split_id"),
        col("n1"), col("c1"), col("n2"), col("c2"), col("z2_ppm"),
        expr(s"CASE WHEN z2_ppm IS NULL THEN false " +
          s"ELSE z2_ppm > $Chi2Crit05Ppm END").as("rejected"))
  }

  /** The q237 comparison slices (order totals of these two years). */
  val MwYearA = 1995
  val MwYearB = 1996

  /** q237: Mann–Whitney U — the nonparametric two-sample location test
    * (Mann & Whitney 1947), completing the test family beside the
    * parametric z² (q202) and distribution-shape KS (q143): did order
    * values SHIFT between two years, with no normality assumption and
    * exact tie handling. Everything is exact integers in doubled rank
    * units: per distinct value, 2·avg_rank = 2·cum_before + t + 1
    * (always an integer), 2R_A = Σ cnt_A·(2·cum_before + t + 1),
    * u2_a = 2·U_A = 2R_A − n_A(n_A+1). Reported effect size is the
    * rank-biserial correlation r = 1 − 2U/(n_A·n_B) in exact ppm
    * (positive ⇒ year A stochastically larger); mu2 = n_A·n_B (= 2·E[U])
    * and the tie mass Σ(t³−t) ride along so a consumer can form the
    * variance/z-score at whatever precision it wants.
    *
    * Scale: ranks come from the VALUE-HISTOGRAM (the q143/q187
    * posture) — one aggregation to the value-bounded relation, one
    * running sum over it, never a corpus-scale sort. The t³ tie mass
    * and n_A·n_B products are DECIMAL-widened.
    */
  def mannWhitneyU(spark: SparkSession, dir: String): DataFrame =
    mannWhitneyUFor(Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("yr"),
        Determinism.cents(col("o_totalprice")).as("v"))
      .filter(col("yr") === MwYearA || col("yr") === MwYearB)
      .select((col("yr") === MwYearA).as("is_a"), col("v")))

  /** [[mannWhitneyU]]'s algebra over an explicit (is_a, v) sample
    * relation — fixture-testable.
    */
  def mannWhitneyUFor(vals: DataFrame): DataFrame = {
    val hist = vals.groupBy(col("v"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("t", expr("cnt_a + cnt_b"))
      .withColumn("cum", sum(col("t")).over(wCum))
      .withColumn("rank2", expr("2 * (cum - t) + t + 1"))
    // r2_a ≈ 2n² — DECIMAL-widened like the tie mass (it wraps a long
    // at ~2×10⁹ sampled rows); the emitted BIGINTs inherit that ceiling
    ranked.agg(
        sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"),
        sum(expr("CAST(cnt_a AS DECIMAL(38,0)) * rank2")).as("r2_a"),
        sum(expr("CAST(t AS DECIMAL(38,0)) * t * t - t")).as("tie_mass_d"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(r2_a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT)")
          .as("u2_a"),
        expr("n_a * n_b").as("mu2"),
        expr("CAST(tie_mass_d AS BIGINT)").as("tie_mass"),
        expr("CAST((r2_a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)) " +
          "* 1000000 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) " +
          "- 1000000").as("rank_biserial_ppm"))
  }
}
