package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sketch-based profiling for 100 TB tables (SURVEY §7.3 step 6): at
  * scale, exact `COUNT(DISTINCT)` and exact percentiles shuffle every
  * value; the sketch forms (HyperLogLog++ via `approx_count_distinct`,
  * GK quantile summaries via `percentile_approx`) aggregate into
  * constant-size state with map-side partial merge — one narrow shuffle
  * of sketches, not data.
  *
  * Sketch outputs are approximate and engine-specific, so these are
  * library operators with ScalaTest accuracy bounds rather than DuckDB
  * hash-match oracles.
  */
object Profiler {

  /** Per-column cardinality profile of a table: exact count, HLL distinct
    * estimate per column.
    */
  def cardinalityProfile(spark: SparkSession, dir: String, table: String,
      rsd: Double = 0.05): DataFrame = {
    val df = Tables.table(spark, dir, table)
    val aggs = count(lit(1)).as("n_rows") +:
      df.columns.toSeq.map(c => approx_count_distinct(col(c), rsd).as(s"ndv_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Cardinality profile with the sketch cross-checked against the exact
    * answer in the same pass: per column, the exact `COUNT(DISTINCT)`
    * (engine-portable, DuckDB-hash-matchable) plus a boolean asserting
    * the HLL estimate landed within 3·rsd of it. The exact columns give
    * the oracle a hash target; the booleans make the sketch itself part
    * of the graded result (HLL++ is deterministic for fixed input, so
    * the booleans are stable). The sketch-only [[cardinalityProfile]]
    * remains the 100 TB production path — this variant pays the exact
    * distinct shuffle and exists for verification and small-table
    * profiling.
    */
  def cardinalityProfileChecked(spark: SparkSession, dir: String, table: String,
      rsd: Double = 0.05): DataFrame =
    cardinalityProfileCheckedFor(Tables.table(spark, dir, table), rsd)

  def cardinalityProfileCheckedFor(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val cols = df.columns.toSeq
    // Sketch + row count in one pass: N HLL buffers aggregate without the
    // Expand operator multi-COUNT(DISTINCT) plans (which multiplies every
    // input row by N+1 at full width — measured 3 s warm on 9-column
    // orders at sf0.1; this formulation runs ~4x faster).
    val sketches = count(lit(1)).as("n_rows") +:
      cols.map(c => approx_count_distinct(col(c), rsd).as(s"hll_$c"))
    val sketchRow = df.agg(sketches.head, sketches.tail: _*)
    // Exact NDV per column via a NARROW manual expand: (column-name,
    // stringified value) pairs → distinct → per-column count → pivot to
    // one row. Same two-shuffle depth, but rows are 2 strings instead of
    // the full table width, and partial aggregation collapses dups
    // map-side. Casting to string is NDV-preserving for atomic types.
    val pairs = df.select(explode(map(
      cols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)).as(Seq("cname", "v")))
      .filter(col("v").isNotNull) // COUNT(DISTINCT) semantics: nulls don't count
    val exactRow = pairs.distinct()
      .groupBy(col("cname")).agg(count(lit(1)).as("ndv"))
      .groupBy().pivot("cname", cols).agg(sum(col("ndv")))
    // both sides are single rows — a trivial broadcast nested-loop join.
    // An all-NULL column contributes no (cname, v) pair, so its pivot cell
    // is NULL — coalesce to 0 to keep COUNT(DISTINCT)'s 0-and-true
    // semantics (the HLL estimate of an all-null column is also 0).
    val out = cols.flatMap { c =>
      val exact = coalesce(col(c), lit(0L))
      val tol = greatest(lit(1L), (exact * 3 * rsd).cast("long"))
      Seq(exact.as(s"ndv_$c"),
        (abs(col(s"hll_$c") - exact) <= tol).as(s"hll_ok_$c"))
    }
    sketchRow.crossJoin(exactRow)
      .select(col("n_rows") +: out: _*)
  }

  /** Approximate quantiles of a numeric column. */
  def quantiles(df: DataFrame, column: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95, 0.99),
      accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(column),
      array(probs.map(lit(_)): _*), lit(accuracy)).as("quantiles"))

  /** Frequent-items profile (approximate heavy hitters). */
  def heavyHitters(df: DataFrame, column: String, support: Double = 0.01): DataFrame =
    df.stat.freqItems(Array(column), support)

  /** Join-key skew profile, exact part: key count and hottest-key row
    * count — the pre-flight check before a big join. Both are exact
    * aggregates (count + max over per-key counts), so this half is
    * oracle-checkable cross-engine; the sketch half lives in
    * [[keySkewQuantiles]].
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"), max(col("n")).as("max_n"))

  /** Join-key skew profile, sketch part: GK-approximate p50/p99 of the
    * per-key counts. A key whose count dwarfs the p99 is a salting /
    * AQE-skew-split candidate. Approximate and engine-specific — the
    * oracle-graded audit of this sketch is [[keySkewQuantilesChecked]]
    * (q80).
    */
  def keySkewQuantiles(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(
        percentile_approx(col("n"), lit(0.5), lit(10000)).as("p50_n"),
        percentile_approx(col("n"), lit(0.99), lit(10000)).as("p99_n"))

  /** GK accuracy knob shared by [[keySkewQuantiles]] and its audit:
    * rank error ≤ n_keys / accuracy.
    */
  val SkewQuantileAccuracy = 10000

  /** Exact per-key-count quantiles with a GK audit (q80) — grades the
    * [[keySkewQuantiles]] sketch the way q77 grades the median sketch.
    * The hash-compared columns are EXACT value-at-rank quantiles of the
    * per-key count distribution: p50 at rank ⌈0.5·n_keys⌉, p99 at rank
    * ⌈0.99·n_keys⌉ over the sorted counts — deterministic integer
    * picks both engines can reproduce. `gk_ok` checks Spark's
    * `percentile_approx` answers against the Greenwald-Khanna contract
    * at BOTH quantiles: each returned value's rank interval
    * [n_lt+1, n_le] must cover the target rank within
    * ±(n_keys/accuracy + 1). TRUE on the oracle side; a sketch leaving
    * its bound fails the round.
    *
    * The exact side sorts only the per-key COUNTS (n_keys rows, already
    * reduced from the corpus) — the same "exact audit at round
    * boundaries, sketch in production" trade as q75/q77.
    */
  def keySkewQuantilesChecked(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val appx = counts.agg(
      percentile_approx(col("n"), lit(0.5), lit(SkewQuantileAccuracy)).as("a50"),
      percentile_approx(col("n"), lit(0.99), lit(SkewQuantileAccuracy)).as("a99"),
      count(lit(1)).as("cnt"))
    val ranked = counts.select(col("n"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n"), col(keyCol))).as("rn"))
    ranked.crossJoin(broadcast(appx))
      .agg(
        max(col("cnt")).as("cnt"),
        sum(when(col("rn") === expr("(cnt + 1) DIV 2"), col("n")).otherwise(0L)).as("p50_n"),
        sum(when(col("rn") === expr("(99 * cnt + 99) DIV 100"), col("n")).otherwise(0L)).as("p99_n"),
        sum(when(col("n") <= col("a50"), 1L).otherwise(0L)).as("n_le50"),
        sum(when(col("n") < col("a50"), 1L).otherwise(0L)).as("n_lt50"),
        sum(when(col("n") <= col("a99"), 1L).otherwise(0L)).as("n_le99"),
        sum(when(col("n") < col("a99"), 1L).otherwise(0L)).as("n_lt99"))
      .withColumn("rank_err", expr(s"cnt DIV $SkewQuantileAccuracy + 1"))
      .withColumn("gk_ok",
        col("n_le50") >= expr("(cnt + 1) DIV 2") - col("rank_err") &&
          col("n_lt50") < expr("(cnt + 1) DIV 2") + col("rank_err") &&
          col("n_le99") >= expr("(99 * cnt + 99) DIV 100") - col("rank_err") &&
          col("n_lt99") < expr("(99 * cnt + 99) DIV 100") + col("rank_err"))
      .select(col("p50_n"), col("p99_n"), col("gk_ok"))
  }
}
