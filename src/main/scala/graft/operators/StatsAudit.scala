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
}
