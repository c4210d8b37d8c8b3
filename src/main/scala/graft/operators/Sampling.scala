package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic, engine-portable sampling and splitting for training-data
  * pipelines. `rand()`-based sampling is neither reproducible across runs
  * nor portable across engines; instead every row gets a stable md5-derived
  * bucket from its key, so a sample/split is a pure filter — reproducible,
  * join-free, and identical on any engine or partitioning.
  */
object Sampling {

  val Buckets = 1000000L

  /** Default split boundaries: train < 0.8, val < 0.9, test above —
    * shared with the oracle replays (SparkEntry.splitRelSql) so the
    * split rule is defined once.
    */
  val DefaultTrainRate = 0.8
  val DefaultValRate = 0.1

  /** Stable per-key bucket in [0, 1e6): md5 of the key column's string
    * form, first 8 hex chars, mod 1e6 — via the native
    * [[graft.functions.Md5PrefixLong]] (same value as the oracle's
    * `conv(substr(md5(..), 1, 8), 16, 10)`). `keyCol` must be a plain
    * column name (it is spliced into a SQL expression).
    */
  def hashBucket(keyCol: String): Column =
    expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(CAST($keyCol AS STRING), 8)") % Buckets

  /** Keep ~`rate` of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    df.filter(hashBucket(keyCol) < (rate * Buckets).toLong)
  }

  /** Stratified train/val/test assignment by key hash: 0=train 1=val
    * 2=test with the given ppm-exact boundaries.
    */
  def split(df: DataFrame, keyCol: String,
      trainRate: Double = DefaultTrainRate,
      valRate: Double = DefaultValRate): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val b = hashBucket(keyCol)
    val t1 = (trainRate * Buckets).toLong
    val t2 = ((trainRate + valRate) * Buckets).toLong
    df.withColumn("split",
      when(b < t1, "train").when(b < t2, "val").otherwise("test"))
  }

  /** q48: deterministic 10% document sample (ids only — stable under any
    * execution plan).
    */
  def documentSample(spark: SparkSession, dir: String): DataFrame =
    sampleByHash(Tables.documents(spark, dir), "doc_id", 0.1)
      .select(col("doc_id"), col("lang"))

  /** Deterministic WEIGHTED sample (q131) — priority / sequential
    * Poisson sampling (Ohlsson 1998; Duffield et al. 2007): each item
    * gets priority = hash / weight and the k smallest priorities win,
    * so inclusion probability rises with weight while the hash keeps
    * selection deterministic and key-stable — the weighted sibling of
    * [[sampleByHash]], in pure integers (hash scaled by 1e6 before the
    * division so the quotient keeps 6 significant digits; no
    * u^(1/w) floats to drift cross-engine).
    *
    * Scale: priority is a map-side expression; "k smallest" is a
    * global top-k, which Spark executes as TakeOrderedAndProject —
    * per-partition heaps of k, then a k-row merge on the driver. No
    * shuffle of the corpus at any size. Weighted by n_chars here: the
    * curation use is token-mass-proportional corpus subsampling.
    */
  def prioritySample(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(CAST(doc_id AS STRING), 8)" +
          " * 1000000 DIV n_chars").as("priority"))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(k)
  }

  /** q49: split distribution — counts per split per language. */
  def splitDistribution(spark: SparkSession, dir: String): DataFrame =
    split(Tables.documents(spark, dir), "doc_id")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))

  /** Stratified sampling with PER-STRATUM rates — the corpus-mixing op:
    * down-weight over-represented strata (a dominant language, a crawl
    * source) to a target mix without a shuffle. Each row's keep/drop is
    * the same key-hash filter as [[sampleByHash]], just with the
    * threshold looked up from its stratum — still a narrow map, still
    * deterministic under any partitioning, still join-free (the rate
    * table rides along as a literal CASE, never a join at 100 TB).
    * Strata absent from `rates` keep `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(keyCol) < threshold)
  }

  /** Token-budget mixing weights (q79) — the planning half of corpus
    * mixing: given per-language token totals (BPE-ish counts, the same
    * regex as q50), compute the down-sampling weight that moves each
    * language toward a uniform token share. `weight_ppm` is what a
    * pipeline feeds straight into [[stratifiedSample]]'s rate map;
    * `kept_tokens` is the resulting budget. Down-sampling only
    * (weights cap at 1e6) — under-represented languages keep everything,
    * matching how real mixes are built (you can't up-sample tokens you
    * don't have without repeating them).
    *
    * All ratios are integer ppm arithmetic, so the plan is two tiny
    * aggregations and a broadcast — nothing here scales with corpus
    * size except the one token-counting scan.
    */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"),
        regexp_count(col("text"), lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"))
          .cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
    val totals = perLang.agg(
      sum(col("tok_total")).as("grand_total"), count(lit(1)).as("n_langs"))
    perLang.crossJoin(broadcast(totals))
      .withColumn("share_ppm", expr("tok_total * 1000000 DIV grand_total"))
      // greatest(share_ppm, 1): a long-tail language whose token share
      // floors below 1 ppm would divide by zero — ANSI Spark aborts,
      // DuckDB yields NULL; clamping keeps the "under-represented
      // languages keep everything" semantics (weight caps at 1e6) and is
      // identical in the oracle SQL
      .withColumn("weight_ppm", expr(
        "least(CAST(1000000 AS BIGINT), (1000000 DIV n_langs) * 1000000 DIV greatest(share_ppm, CAST(1 AS BIGINT)))"))
      .withColumn("kept_tokens", expr("tok_total * weight_ppm DIV 1000000"))
      .select(col("lang"), col("n_docs"), col("tok_total"),
        col("share_ppm"), col("weight_ppm"), col("kept_tokens"))
  }

  /** Budget multiplier and epoch cap for [[epochMixPlan]]. */
  val MixBudgetX = 3L
  val MaxEpochsPpm = 4000000L

  /** Data-constrained mixing plan (q119) — the UP-sampling complement
    * of [[mixWeights]] (which only down-samples): a token budget of
    * [[MixBudgetX]]× the corpus is split equally across languages, and
    * each language serves its target by repeating its data, capped at
    * [[MaxEpochsPpm]] (4 epochs — the "repeating helps up to ~4 passes"
    * regime of data-constrained scaling, Muennighoff et al. 2023).
    * Single-pass allocation: a capped language's unmet target is
    * reported, not redistributed (the redistribution loop is a driver
    * decision, not a per-row one). Exact-integer ppm; the epoch ratio
    * widened through DECIMAL so target·1e6 survives petabyte token
    * counts under ANSI.
    */
  def epochMixPlan(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(spark, dir)
      .select(col("lang"),
        regexp_count(col("text"), lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"))
          .cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
    val totals = perLang.agg(
      sum(col("tok_total")).as("grand_total"), count(lit(1)).as("n_langs"))
    perLang.crossJoin(broadcast(totals))
      .withColumn("target_tok",
        expr(s"grand_total * $MixBudgetX DIV n_langs"))
      .withColumn("epochs_ppm", expr(
        s"least(CAST($MaxEpochsPpm AS BIGINT), " +
          "CAST(CAST(target_tok AS DECIMAL(38,0)) * 1000000 DIV tok_total AS BIGINT))"))
      .withColumn("served_tok", expr(
        "CAST(CAST(tok_total AS DECIMAL(38,0)) * epochs_ppm DIV 1000000 AS BIGINT)"))
      .withColumn("unmet_tok", expr("target_tok - served_tok"))
      .select(col("lang"), col("n_docs"), col("tok_total"), col("target_tok"),
        col("epochs_ppm"), col("served_tok"), col("unmet_tok"))
  }

  /** Temperature-scaled source mixing (q186) — the third point on the
    * mixing spectrum: [[mixWeights]] (q79) flattens to UNIFORM shares
    * (τ→0) and [[epochMixPlan]] (q119) budgets against them; natural
    * sampling is τ=1. The multilingual-training standard (mT5/XLM-R
    * style) sits between: sample source i ∝ pᵢ^τ. τ=1/2 is the one
    * temperature with an ENGINE-EXACT form — pᵢ^½ via integer
    * floor(sqrt), which IEEE-754 specifies exactly in both engines —
    * so the graded contract pins τ=1/2 rather than hashing a libm
    * `pow` whose last ulp is implementation-defined.
    *
    * Output per language: natural share, temperature share (both ppm
    * of their totals), and the boost factor temperature/natural — the
    * up-sampling a low-resource language receives. Plan: one corpus
    * pass to the language-bounded relation, then broadcast totals.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMixFor(Tables.documents(spark, dir))

  def temperatureMixFor(docs: DataFrame): DataFrame = {
    val perLang = docs
      .select(col("lang"),
        regexp_count(col("text"), lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"))
          .cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
      .withColumn("sqrt_tok",
        expr("CAST(floor(sqrt(CAST(tok_total AS DOUBLE))) AS BIGINT)"))
    val totals = perLang.agg(
      sum(col("tok_total")).as("grand_total"),
      sum(col("sqrt_tok")).as("sqrt_total"))
    perLang.crossJoin(broadcast(totals))
      .withColumn("nat_share_ppm",
        expr("tok_total * 1000000 DIV grand_total"))
      .withColumn("temp_share_ppm",
        expr("sqrt_tok * 1000000 DIV sqrt_total"))
      .withColumn("boost_ppm", expr(
        "temp_share_ppm * 1000000 DIV greatest(nat_share_ppm, CAST(1 AS BIGINT))"))
      .select(col("lang"), col("n_docs"), col("tok_total"),
        col("nat_share_ppm"), col("temp_share_ppm"), col("boost_ppm"))
  }

  /** Per-epoch sampling rate (ppm of [[Buckets]]) for [[epochOverlap]]. */
  val EpochRatePpm = 333333L

  /** Epoch-sample seed-independence audit (q196) — the seed-health
    * check behind per-epoch subsampling: two epochs draw their subsets
    * with DIFFERENT salts on the same key-hash filter
    * ([[sampleByHash]]'s bucket rule), and if the salted hashes are
    * independent the overlap share must sit at the product of the
    * rates. A correlated seed pair (the classic copy-paste salt bug)
    * shows up as obs ≫ exp before any training run is wasted on
    * near-identical epochs. Exact integers end-to-end: obs_ppm =
    * n₁₂·10⁶ DIV n, exp_ppm = (n₁·10⁶ DIV n)·(n₂·10⁶ DIV n) DIV 10⁶.
    *
    * Scale: ONE corpus pass — both membership bits are map-side hash
    * filters (no sort, no top-k; rate-threshold sampling is the 100 TB
    * form of "take k per epoch"), aggregated to a single row.
    */
  def epochOverlap(spark: SparkSession, dir: String): DataFrame =
    epochOverlapFor(Tables.documents(spark, dir))

  def epochOverlapFor(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val fn = graft.functions.GraftFunctions.Md5PrefixName
    def member(salt: String): org.apache.spark.sql.Column =
      (expr(s"$fn(concat(CAST(doc_id AS STRING), '$salt'), 8)") % Buckets <
        EpochRatePpm).cast("long")
    docs
      .select(member("#e1").as("m1"), member("#e2").as("m2"))
      .agg(count(lit(1)).as("n"), sum(col("m1")).as("n1"),
        sum(col("m2")).as("n2"), sum(col("m1") * col("m2")).as("n12"))
      .select(col("n"), col("n1"), col("n2"), col("n12"),
        // DECIMAL-widened: count·10⁶ overflows a long past ~9·10¹² rows
        expr("CAST(CAST(n12 AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)")
          .as("obs_ppm"),
        expr("CAST((CAST(n1 AS DECIMAL(38,0)) * 1000000 DIV n) * " +
          "(CAST(n2 AS DECIMAL(38,0)) * 1000000 DIV n) DIV 1000000 AS BIGINT)")
          .as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** Output shards for a training-data write. */
  val Shards = 64L

  /** Deterministic shard-balance audit (q86) — the output half of a
    * training pipeline: documents are assigned to one of [[Shards]]
    * shards by the same stable key hash as [[sampleByHash]] (so shard
    * membership survives reruns, repartitioning, and incremental
    * appends), and the audit reports each shard's document and token
    * load plus its deviation from the even share in ppm. This is the
    * check you run before `write.partitionBy(shard)` at 100 TB — a hot
    * shard means a straggler executor and an oversized output file.
    *
    * Plan: one narrow map (hash + token count) + one 64-group
    * aggregation with map-side partials + a broadcast 1-row total.
    * Nothing scales with corpus size except the single scan.
    */
  def shardBalance(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val perShard = Tables.documents(spark, dir)
      .withColumn("shard", hashBucket("doc_id") % Shards)
      .withColumn("n_tok", size(graft.operators.TextOps.tokens(col("text"))).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
    // straight off the corpus (a doc_id-only columnar scan), not a
    // re-aggregation of perShard — keeps the plan at one hash shuffle
    val total = Tables.documents(spark, dir).agg(count(lit(1)).as("total_docs"))
    perShard.crossJoin(broadcast(total))
      // 1e6 = perfectly even; a shard at 2e6 holds twice its share
      .withColumn("load_ppm", expr(s"n_docs * $Shards * 1000000 DIV total_docs"))
      .select(col("shard"), col("n_docs"), col("tok_total"),
        col("min_doc"), col("max_doc"), col("load_ppm"))
  }

  /** Token budget for [[tokenBudgetSelect]], as a ppm share of the
    * corpus's total tokens — relative, so the op means the same thing
    * at any scale.
    */
  val BudgetPpm = 500000L

  /** Score-bucket width for [[tokenBudgetSelect]]: rarity scores are
    * grouped into buckets of this width before the cumulative sweep.
    */
  val BudgetBucketWidth = 4L

  /** Token-budget quality selection (q94) — "keep the highest-quality
    * documents until the token budget is spent", the curation step that
    * turns a scored corpus into a training set of a target size. The
    * naive form is a global ORDER BY quality + running SUM(tokens) —
    * a single-partition window over the corpus, dead at 100 TB. This is
    * the two-phase version that scales: documents fold into quality-score
    * buckets (one aggregation, map-side partials), the cumulative token
    * sweep runs best-bucket-first over the BUCKET relation (tiny — one
    * row per score bucket, thousands at most, so its single-partition
    * window is free), and `kept` marks the buckets that fit the budget.
    * The actual selection is then a broadcast-able `kept`-bucket filter;
    * the corpus is never globally sorted.
    *
    * Budget granularity is a whole bucket (a boundary bucket that would
    * overflow the budget is dropped, not split) — deterministic, and at
    * corpus scale a single bucket's mass is noise against the budget.
    * Scores are [[graft.operators.TextOps.tokenRarityScore]]'s exact
    * integers, so the sweep hash-compares across engines.
    */
  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = graft.operators.TextOps.tokenRarityScore(spark, dir)
      .withColumn("score_bucket", expr(s"rarity_score DIV $BudgetBucketWidth"))
    val buckets = scored.groupBy(col("score_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
    val grand = scored.agg(sum(col("n_tok")).as("grand"))
    // the window relation is bucket-sized, not corpus-sized: a single
    // unpartitioned ordered window here is the two-phase trick, not a
    // scale bug
    val sweep = Window.orderBy(col("score_bucket").desc)
    buckets
      .withColumn("cum_tok", sum(col("tok_total")).over(
        sweep.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(grand))
      // cum_tok·1e6 overflows LongType past ~9.2e12 total tokens — and
      // ANSI mode turns that into a query abort, while the oracle's
      // HUGEINT widens silently: a 100 TB-scale cliff on one engine
      // only. DECIMAL(38,0) widening keeps the comparison exact at any
      // corpus size on both engines.
      .withColumn("kept",
        col("cum_tok").cast("decimal(38,0)") * lit(1000000L) <=
          lit(BudgetPpm) * col("grand").cast("decimal(38,0)"))
      .select(col("score_bucket"), col("n_docs"), col("tok_total"),
        col("cum_tok"), col("kept"))
  }

  /** Sample share for [[stratifiedAlloc]]: k = N · AllocPct / 100. */
  val AllocPct = 10L

  /** q155: EXACT-k stratified sampling with largest-remainder
    * allocation — the quota sampler. [[stratifiedSample]] keeps a
    * per-stratum RATE (sample size varies with hash luck by ±√n);
    * training-data contracts are usually the other way around: "exactly
    * k examples, allocated proportionally across (lang, source)". The
    * classic exact answer is largest-remainder (Hamilton) rounding:
    *
    *  - floor share per stratum: a_i = (k · n_i) div N
    *  - the deficit k − Σ a_i (< #strata) goes one unit each to the
    *    strata with the largest remainders (k · n_i) mod N, ties broken
    *    by stratum key — so Σ alloc_i = k EXACTLY, deterministically.
    *
    * Row selection within a stratum is rank-by-stable-hash (md5 of
    * doc_id, ties by doc_id): reproducible and engine-portable. For a
    * FIXED allocation the within-stratum selections nest (the hash
    * order is fixed, so a larger alloc_i only ADDS rows, like q48's
    * bucket filter) — but the overall sample is NOT monotone in k:
    * largest-remainder rounding is subject to the Alabama paradox, so
    * growing k can shrink an individual stratum's allocation and drop
    * rows from it. Callers needing nested samples across k should fix
    * the allocation and vary only the per-stratum take.
    *
    * Scale: the allocation table is STRATA-sized (computed on the
    * per-stratum count relation, metadata scale). The rank step is one
    * shuffle by stratum + a bounded per-group selection; a skewed giant
    * stratum makes the sort partition-local top-alloc_i work — the
    * bounded-heap alternative ([[graft.functions.BoundedTopK]]) slots
    * in when alloc_i is small relative to n_i; at the graded shape the
    * window form is the clearer plan and the strata are coarse.
    *
    * Output: one row per stratum — population, exact allocation, and
    * the selected-id checksum the gate hashes.
    */
  def stratifiedAlloc(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    val strata = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
    // N and k on the strata relation (metadata-sized) — window totals,
    // no driver action
    val wAll = Window.partitionBy(lit(1))
    val withTotals = strata
      .withColumn("n_total", sum(col("n_docs")).over(wAll))
      .withColumn("k", expr(s"(n_total * $AllocPct) div 100"))
      .withColumn("floor_a", expr("(k * n_docs) div n_total"))
      .withColumn("rem", expr("(k * n_docs) % n_total"))
    val alloc = withTotals
      .withColumn("deficit", col("k") - sum(col("floor_a")).over(wAll))
      .withColumn("rem_rank", row_number().over(
        wAll.orderBy(col("rem").desc, col("lang"), col("source"))))
      .withColumn("alloc",
        col("floor_a") + when(col("rem_rank") <= col("deficit"), 1L)
          .otherwise(0L))
      .select(col("lang"), col("source"), col("n_docs"), col("alloc"))
    val ranked = docs
      .withColumn("h", expr(
        s"${graft.functions.GraftFunctions.Md5PrefixName}(CAST(doc_id AS STRING), 12)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("h"), col("doc_id"))))
    val sel = ranked.join(broadcast(alloc), Seq("lang", "source"))
      .filter(col("rn") <= col("alloc"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_sel"), sum(col("doc_id")).as("sel_id_sum"))
    // left join from the allocation so zero-alloc strata still report
    alloc.join(sel, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("n_docs"), col("alloc"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("sel_id_sum"), lit(0L)).as("sel_id_sum"))
  }

  /** q65: language rebalancing of the documents corpus — keep 25% of
    * `en` (the dominant stratum) and everything else, reported as the
    * per-language before/after mix.
    */
  def stratifiedMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sampled = stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.25))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      .join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
