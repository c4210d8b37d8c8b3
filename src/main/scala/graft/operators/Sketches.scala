package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Sketch-accelerated operators with exact audits — the three sketch
  * families a 100 TB curation pipeline leans on beyond HLL (q55) and GK
  * (q56): Bloom membership for incremental dedup, count-min for heavy
  * hitters, and a rank-error audit for approximate quantiles.
  *
  * The oracle pattern matches q55/q73: every hash-compared column is
  * EXACT (so DuckDB can reproduce it), and each sketch contributes a
  * boolean `*_ok` column that verifies the sketch's guarantee against
  * the exact value — TRUE on the oracle side, computed on ours. A sketch
  * drifting out of its error bound fails the round, not just a unit test.
  */
object Sketches {

  /** Target false-positive rate for [[bloomPrefilterDedup]]'s sketch.
    * The filter is sized FROM THE CORPUS at build time (see
    * [[bloomBitsFor]]) — a constant bit count is a silent FPR cliff the
    * moment the corpus outgrows it (VERDICT r5), turning the prefilter's
    * anti-join reduction into a no-op.
    */
  val BloomTargetFpr = 0.02

  /** Optimal Bloom bits for `n` keys at false-positive rate `fpr`:
    * m = ⌈n·ln(1/p)/ln²2⌉ (≈ 8.15 bits/key at p = 0.02), floored so a
    * near-empty test corpus still gets a non-degenerate sketch. At 1e9
    * distinct fingerprints this is ~1 GB of bits — still one broadcast
    * per incremental batch, never a shuffle.
    */
  def bloomBitsFor(n: Long, fpr: Double = BloomTargetFpr): Long =
    math.max(4096L,
      math.ceil(math.max(n, 1L).toDouble * math.log(1.0 / fpr)
        / (math.log(2.0) * math.log(2.0))).toLong)

  /** Incremental exact dedup with a Bloom-filter prefilter (q74) — the
    * scale path for [[TextOps.dedupAgainstCorpus]]'s recurring-crawl
    * shape. The corpus's distinct fingerprints are folded once into a
    * Bloom filter (Spark's own runtime-filter sketch, built by
    * [[graft.functions.GraftFunctions.BloomBuildName]]); the new batch
    * probes it as a broadcast map-side filter. Rows the filter rejects
    * are DEFINITELY new (no false negatives) and skip the anti-join
    * entirely; only the `mightContain` candidates — true dups plus the
    * ~2% false positives — reach the exact confirm join.
    *
    * Result is bit-identical to the plain anti-join (the filter only
    * routes rows); at 100 TB the anti-join's probe side shrinks from
    * |batch| to |dups| + 2%, which is the difference between shuffling
    * a crawl and shuffling its duplicates.
    *
    * Corpus here = `doc_id % 3 != 0` (vs q61's % 5 split, so the two
    * incremental-dedup variants are checked on different corpora).
    */
  def bloomPrefilterDedup(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
    val corpusFps = docs.filter(col("doc_id") % 3 =!= 0)
      .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
    // size the sketch from the corpus itself: one count over the
    // distinct fingerprints (in a standing pipeline this is the
    // profiler's NDV, already on hand) fixes the bit budget for the
    // target FPR at ANY corpus size
    val nFps = corpusFps.count()
    val numBits = bloomBitsFor(nFps)
    // index build: one sketch collected to the driver (the same collect
    // a broadcast does), then shipped as a literal into codegen
    val bf = corpusFps
      .agg(expr(s"${GraftFunctions.BloomBuildName}(xxhash64(fp), " +
        s"${math.max(nFps, 1L)}, $numBits)").as("bf"))
      .head.getAs[Array[Byte]](0)
    val batch = docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .withColumn("maybe_seen",
        call_function(GraftFunctions.BloomContainsName, lit(bf), xxhash64(col("fp"))))
    val confirmedNew = batch.filter(col("maybe_seen"))
      .join(corpusFps, Seq("fp"), "left_anti")
    val definitelyNew = batch.filter(!col("maybe_seen"))
    confirmedNew.select(col("fp"), col("doc_id"))
      .union(definitelyNew.select(col("fp"), col("doc_id")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
  }

  /** Count-min sketch error budget for [[heavyHittersChecked]]:
    * est − exact ≤ CmsEps·N with probability ≥ CmsConfidence.
    */
  val CmsEps = 0.001
  val CmsConfidence = 0.99
  val CmsSeed = 42
  val HeavyHittersK = 20

  /** Corpus heavy hitters with a count-min audit (q75). The exact top-k
    * tokens (one explode + partial-agg groupBy + TakeOrderedAndProject —
    * the same plan family as q32/q03) are the hash-compared result; each
    * row carries `cms_ok`, verifying Spark's `count_min_sketch` estimate
    * for that token against the count-min guarantee: one-sided
    * (est ≥ exact) and within ε·N above it.
    *
    * At 100 TB the sketch is the point: a fixed ~⌈2/ε⌉×⌈ln(1/δ)⌉ integer
    * grid per partition, merged associatively — heavy-hitter estimates
    * with no per-token state, while the exact top-k (which needs the full
    * groupBy) is the audit run on a sample or a round boundary. Probing
    * k terms through the driver-side sketch is O(k), k=20.
    */
  def heavyHittersChecked(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val sketchRow = toks.agg(
      expr(s"count_min_sketch(token, ${CmsEps}d, ${CmsConfidence}d, $CmsSeed)").as("cms"),
      count(lit(1)).as("n_total")).head
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchRow.getAs[Array[Byte]](0)))
    val budget = math.ceil(CmsEps * sketchRow.getAs[Long](1)).toLong
    // audit: the exact top-k is collected ONCE (token AND count — k=20
    // rows), each winner probed through the driver-side sketch, and the
    // result returned as a local relation — executing the returned
    // DataFrame costs nothing, so each run scans the corpus exactly
    // twice (sketch pass + top-k pass), not three times
    val topk = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(HeavyHittersK)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    import spark.implicits._
    topk.toSeq.zipWithIndex.map { case ((token, n), i) =>
      val e = cms.estimateCount(token)
      (token, n, i + 1, e >= n && e <= n + budget)
    }.toDF("token", "n", "rank", "cms_ok")
  }

  /** Sketch size for [[kmvDistinctChecked]]: standard error ≈ 1/√(k−2)
    * ≈ 3.1 %.
    */
  val KmvK = 1024

  /** Target relative (standard) error for the DERIVED-k KMV twin
    * (q139) — the knob a user actually holds. The pinned [[KmvK]] form
    * (q135) stays as the fixed-seed oracle, the q106/q108 posture
    * applied to the last pinned sketch size.
    */
  val KmvTargetRelErr = 0.05

  /** KMV size for a target standard error ε ≈ 1/√(k−2):
    * k = ⌈1/ε²⌉ + 2 — the [[bloomBitsFor]] pattern (size the sketch
    * from the guarantee, never a constant), floored so an absurdly
    * loose target still keeps a non-degenerate sketch. ε = 5% → k=402;
    * ε = 1% → k=10 002. The sketch is k values whatever the corpus
    * size — deriving k costs nothing at 100 TB.
    */
  def kmvKFor(relErr: Double): Int =
    math.max(64, math.ceil(1.0 / (relErr * relErr)).toInt + 2)

  /** Gate bound for a KMV estimate at target error `relErr`: ~3.2σ in
    * ppm — the same confidence [[KmvK]]'s fixed 10% bound encodes
    * (3.2/√1022 ≈ 10%).
    */
  def kmvBoundPpm(relErr: Double): Long =
    math.ceil(3.2 * relErr * 1000000.0).toLong

  /** KMV (k-minimum-values) distinct sketch with an exact audit (q135)
    * — the one NDV estimator that is exactly replayable cross-engine:
    * hash every token through the engine-wide md5-prefix hash (32-bit
    * space, the same value DuckDB computes from hex algebra), keep the
    * k smallest DISTINCT hash values, and estimate
    * NDV ≈ (k−1)·2³² / h₍ₖ₎. Unlike HLL (q55's opaque binary buffer)
    * the sketch IS a k-row value set: unionable by re-taking the min-k
    * of a union (the shard-merge a 100 TB profiler needs), diffable,
    * and hash-comparable.
    *
    * Plan shape: one vocabulary-bounded distinct (map-side partial
    * dedup does most of the work), then bottom-k as
    * TakeOrderedAndProject (per-partition heaps, q03/q131's plan — the
    * corpus never globally sorts). The exact NDV audit rides the same
    * distinct. `kmv_ok` asserts the estimate landed within 10 %
    * (≈3.2σ) of the exact count — deterministic on both engines, so a
    * hash/estimator drift fails the gate rather than wobbling.
    */
  def kmvDistinctChecked(spark: SparkSession, dir: String): DataFrame =
    kmvDistinctCheckedK(spark, dir, KmvK, boundPpm = 100000L)

  /** Derived-k twin (q139): k sized from [[KmvTargetRelErr]] via
    * [[kmvKFor]], graded against the matching [[kmvBoundPpm]] — the
    * production posture (hold the error target, derive the knob), with
    * q135's pinned k kept as the fixed-seed oracle.
    */
  def kmvDistinctDerived(spark: SparkSession, dir: String): DataFrame =
    kmvDistinctCheckedK(spark, dir,
      kmvKFor(KmvTargetRelErr), kmvBoundPpm(KmvTargetRelErr))

  /** KMV shard-merge algebra under the gate (q142) — the property that
    * makes KMV the 100 TB profiler's NDV sketch: min-k sketches built
    * INDEPENDENTLY per shard (here: per source) merge by re-taking the
    * min-k of their union, and the merged sketch equals the sketch
    * built over the whole corpus EXACTLY — min-k(∪ min-k(Sᵢ)) =
    * min-k(∪ Sᵢ), since any globally k-smallest value is necessarily
    * k-smallest within its own shard. The round-9 spec asserted this on
    * a toy relation; this grades it on the corpus, against the oracle,
    * with the derived k. Output: one row per side (merged / global)
    * with h_k, n_kept, and the estimate — hash-equal rows ⇒ the merge
    * is exact, and DuckDB replays both sides independently.
    *
    * Plan: per-shard min-k is a rank window over the distinct hashes
    * (shard-local, the distributed step); the union of survivors is
    * shards×k rows — driver-scale — so the global re-take is free.
    */
  def kmvShardMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val k = kmvKFor(KmvTargetRelErr)
    val hashed = Dedup.shingles(Tables.documents(spark, dir))
      .select(col("source"),
        expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(sh, 8)").as("hv"))
      .distinct()
    def sketchOf(hv: DataFrame, side: String): DataFrame =
      hv.orderBy(col("hv").asc).limit(k)
        .agg(max(col("hv")).as("h_k"), count(lit(1)).as("n_kept"))
        .select(lit(side).as("side"), lit(k.toLong).as("k"),
          col("n_kept"), col("h_k"),
          when(col("n_kept") < k, col("n_kept"))
            .otherwise(expr("(n_kept - 1) * 4294967296 DIV greatest(h_k, 1)"))
            .as("est_ndv"))
    val w = Window.partitionBy(col("source")).orderBy(col("hv").asc)
    val perShard = hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("hv")).distinct() // cross-shard duplicate hashes collapse
    sketchOf(perShard, "merged")
      .unionAll(sketchOf(hashed.select(col("hv")).distinct(), "global"))
  }

  /** KMV INTERSECTION estimator with exactness audit (q197) — the
    * theta-sketch completion of the KMV family (cardinality q135/q139,
    * union-merge q142): for every source pair, the k smallest hashes
    * of the UNION form the sketch, θ is its k-th value, and the
    * intersection estimate is the matched fraction scaled by the union
    * estimate — est = c·(k−1)·2³² DIV (k·θ) where c counts sketch
    * hashes present in BOTH sides. Soundness of membership-by-sketch:
    * the union's k-th smallest is ≤ each side's k-th smallest, so any
    * sketch hash belonging to a side is necessarily inside that side's
    * per-source sketch — no full-set probe needed. An undersized union
    * sketch IS the union, making c the exact intersection (the q135
    * undersized rule).
    *
    * The audit joins the EXACT pair intersections, computed with the
    * bounded source-set trick: per hash, the ≤|sources| set of sources
    * containing it explodes to pairs inside the row — never a
    * hash-keyed self-join fan-out beyond C(|sources|,2).
    *
    * Scale: per-source and per-pair top-k run as windows over the
    * DISTINCT (source, hash) relation — every partition is k-bounded
    * after the filter; the pair algebra runs on the ≤ pairs·k kept
    * relation. Only the source-pair list (metadata) broadcasts.
    */
  def kmvIntersections(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val k = kmvKFor(KmvTargetRelErr)
    val hashed = Dedup.shingles(Tables.documents(spark, dir))
      .select(col("source"),
        expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(sh, 8)").as("hv"))
      .distinct()
    val exact = hashed
      .groupBy(col("hv")).agg(expr("sort_array(collect_set(source))").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ss) - 1), i ->
          |  transform(sequence(i + 1, size(ss)), j ->
          |    struct(element_at(ss, i) AS a, element_at(ss, j) AS b))))"""
          .stripMargin)).as("e"))
      .groupBy(col("e.a").as("src_a"), col("e.b").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val kept = hashed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hv").asc)))
      .filter(col("rn") <= k).select(col("source"), col("hv"))
    val srcs = hashed.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .crossJoin(srcs.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    val u = kept
      .join(broadcast(pairs), col("source") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("hv"))
      .unionByName(kept
        .join(broadcast(pairs), col("source") === col("src_b"))
        .select(col("src_a"), col("src_b"), col("hv")))
      .groupBy(col("src_a"), col("src_b"), col("hv"))
      .agg(count(lit(1)).as("n_side"))
    u.withColumn("rn", row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("hv").asc)))
      .filter(col("rn") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("h_k"),
        sum(when(col("n_side") === 2L, 1L).otherwise(0L)).as("c"))
      .join(exact, Seq("src_a", "src_b"), "left_outer")
      .na.fill(0L, Seq("exact_inter"))
      .withColumn("est_inter", when(col("n_kept") < k, col("c"))
        .otherwise(expr(
          s"CAST(CAST(c AS DECIMAL(38,0)) * ${k - 1} * 4294967296 " +
            s"DIV (CAST($k AS DECIMAL(38,0)) * greatest(h_k, 1)) AS BIGINT)")))
      .withColumn("err_ppm", expr(
        "abs(est_inter - exact_inter) * 1000000 DIV greatest(exact_inter, 1)"))
      .select(col("src_a"), col("src_b"), lit(k.toLong).as("k"),
        col("n_kept"), col("h_k"), col("c"), col("est_inter"),
        col("exact_inter"), col("err_ppm"))
  }

  private def kmvDistinctCheckedK(spark: SparkSession, dir: String,
      k: Int, boundPpm: Long): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // sketched key: the 3-token shingle — the dedup family's unit and
    // the one high-cardinality string space in the corpus (the synthetic
    // token vocabulary itself is tiny, which would leave the estimator
    // branch dormant)
    val sh = Dedup.shingles(Tables.documents(spark, dir))
    val hashes = sh.select(
      expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(sh, 8)").as("hv"))
      .distinct()
    val sketch = hashes.orderBy(col("hv").asc).limit(k)
      .agg(max(col("hv")).as("h_k"), count(lit(1)).as("n_kept"))
    val exact = sh.agg(countDistinct(col("sh")).as("exact_ndv"))
    sketch.crossJoin(exact) // two single rows — trivial join
      .withColumn("est_ndv",
        when(col("n_kept") < k, col("n_kept")) // undersized: sketch IS the set
          .otherwise(expr("(n_kept - 1) * 4294967296 DIV greatest(h_k, 1)")))
      .withColumn("err_ppm",
        expr("abs(est_ndv - exact_ndv) * 1000000 DIV exact_ndv"))
      .select(lit(k.toLong).as("k"), col("n_kept"), col("h_k"),
        col("est_ndv"), col("exact_ndv"), col("err_ppm"),
        (col("err_ppm") <= boundPpm).as("kmv_ok"))
  }

  /** Sketch size for [[kmvRollingActives]] — deliberately small so the
    * GRADED corpus already saturates it and the estimator branch runs
    * (the production posture: at 100 TB every window saturates any k).
    */
  val KmvRollK = 64

  /** 3σ relative-error bound for [[KmvRollK]] in ppm: 3/√(k−2). */
  val KmvRollBoundPpm: Long =
    math.ceil(3000000.0 / math.sqrt(KmvRollK - 2.0)).toLong

  /** Rolling 7-day actives from MERGED per-day KMV sketches (q214) —
    * the sketch-cube twin of q210's exact panel, and the reason a
    * 100 TB engagement pipeline keeps sketches at all: per-day min-k
    * sketches are built ONCE (day-local rank, k rows per day), and any
    * trailing window is answered by merging ≤ 7 day-sketches — touch
    * 7k values per window instead of re-scanning the (user, day) grid
    * per window. The merge is EXACT sketch algebra (the q142 law:
    * min-k(∪ min-k(Sᵈ)) = min-k(∪ Sᵈ), since a window's k-smallest
    * hash is necessarily k-smallest within its own day), so ONLY the
    * estimate is approximate, and `kmv_ok` audits it against q210's
    * exact count at the 3σ bound per window.
    *
    * Scale: day sketches via one day-keyed window over the distinct
    * (day, hash) relation; the window merge expands sketch rows by the
    * constant window length (≤ 7k rows per window day) — never the
    * grid; the exact side rides the q210 plan. No broadcasts beyond
    * the 1-row horizon.
    */
  def kmvRollingActives(spark: SparkSession, dir: String): DataFrame =
    kmvRollingActivesFor(Tables.events(spark, dir))

  def kmvRollingActivesFor(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.ensureRegistered(events.sparkSession)
    val k = KmvRollK
    val win = EventsOps.ActiveWindowDays
    val dayNs = 86400000000000L
    val grid = events
      .select(col("user_id"), expr(s"ts_ns DIV $dayNs").as("day"))
      .distinct()
    val hv = grid.select(col("day"),
        expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(" +
          "CAST(user_id AS STRING), 8)").as("hv"))
      .distinct() // hash collisions collapse identically on both engines
    val daySketch = hv
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("day")).orderBy(col("hv").asc)))
      .filter(col("rn") <= k)
      .select(col("day"), col("hv"))
    val horizon = grid.agg(max(col("day")).as("max_day"))
    val merged = daySketch
      .select(col("hv"),
        explode(expr(s"sequence(day, day + ${win - 1})")).as("day"))
      .crossJoin(broadcast(horizon))
      .filter(col("day") <= col("max_day"))
      .select(col("day"), col("hv")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("day")).orderBy(col("hv").asc)))
      .filter(col("rn") <= k)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("h_k"))
      .withColumn("est_7d",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr("(n_kept - 1) * 4294967296 DIV greatest(h_k, 1)")))
    val exact = EventsOps.rollingActivesFor(events)
      .select(col("day"), col("n_active_7d").as("n_exact_7d"))
    merged.join(exact, Seq("day"))
      .withColumn("err_ppm",
        expr("abs(est_7d - n_exact_7d) * 1000000 DIV n_exact_7d"))
      .select(col("day"), col("n_exact_7d"), col("n_kept"), col("h_k"),
        col("est_7d"), col("err_ppm"),
        (col("err_ppm") <= KmvRollBoundPpm).as("kmv_ok"))
  }

  /** `percentile_approx` accuracy knob for [[quantileSketchChecked]]:
    * rank error ≤ n / accuracy.
    */
  val QuantileAccuracy = 10000

  /** Exact per-group median with an approximate-quantile audit (q77).
    * The hash-compared column is the exact distributed median
    * ([[Relational.exactMedianByPriority]]'s formula); `gk_ok` checks
    * Spark's `percentile_approx` (Greenwald-Khanna family) against its
    * rank-error contract: the returned value's rank interval
    * [n_lt+1, n_le] must cover the median position within ±n/accuracy.
    *
    * This is the audit shape for the sketch every 100 TB profiler
    * actually uses — exact medians need a full sort per group; GK needs
    * one pass and O(accuracy·log n) state, and this query proves the
    * trade stayed inside its contract on real data.
    */
  def quantileSketchChecked(spark: SparkSession, dir: String): DataFrame = {
    val cts = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), Determinism.cents(col("o_totalprice")).as("price_c"))
    val appx = cts.groupBy(col("o_orderpriority"))
      .agg(percentile_approx(col("price_c"), lit(0.5), lit(QuantileAccuracy)).as("appx_c"),
        count(lit(1)).as("cnt"))
    val audited = cts.join(broadcast(appx), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(col("cnt")).as("cnt"),
        sum(when(col("price_c") <= col("appx_c"), 1L).otherwise(0L)).as("n_le"),
        sum(when(col("price_c") < col("appx_c"), 1L).otherwise(0L)).as("n_lt"))
      .withColumn("rank_err", expr(s"cnt DIV $QuantileAccuracy + 1"))
      .withColumn("gk_ok",
        col("n_le") >= expr("(cnt + 1) DIV 2") - col("rank_err") &&
          col("n_lt") < expr("(cnt + 2) DIV 2") + col("rank_err"))
      .select(col("o_orderpriority"), col("gk_ok"))
    Relational.exactMedianByPriority(spark, dir)
      .join(audited, Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("median_x2_c"), col("gk_ok"))
  }

  /** Depth (independent hash rows) of the q230 explicit CMS. */
  val CmsF2Depth = 4

  /** Width (buckets per row) of the q230 explicit CMS. */
  val CmsF2Width = 1024L

  /** q230: self-join-size (F2) estimation from an explicit count-min
    * sketch — the PLANNER statistic behind every pair-explosion
    * operator in the engine: Σ_k cnt(k)² over `l_partkey` is exactly
    * the per-part pair mass q183's basket mining explodes into, and a
    * planner must know it BEFORE committing to the explosion. The CMS
    * F2 estimate (min over [[CmsF2Depth]] rows of Σ_j cell_j²) never
    * underestimates — every hash collision adds nonnegative cross
    * terms — so `f2_est ≥ f2_exact` is structural, and the audit
    * grades the Markov bound: excess ≤ 3·(F1² − F2)/width per row with
    * probability ≥ 2/3, so the min over 4 rows fails with prob < 2%.
    * (Deterministic md5-row hashes: the "probability" is over key
    * sets; the graded corpus either passes or the round fails — the
    * q135 KMV discipline.)
    *
    * The sketch is EXPLICIT (md5-prefix row hashes, 4×1024 cells) so
    * DuckDB replays every cell — unlike q75, where Spark's opaque
    * `count_min_sketch` binary forces a bound-only oracle.
    *
    * Scale: one corpus pass explodes each row into [[CmsF2Depth]]
    * (row, bucket) cells; the aggregation is 4096-cell-bounded
    * regardless of key cardinality, and the exact side is one keyed
    * aggregate over the part dimension. Bound arithmetic runs in
    * DECIMAL(38,0) (HUGEINT on the oracle side) — F1² overflows a
    * long already at 3×10⁹ rows.
    */
  def cmsSelfJoinSize(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val keys = Tables.lineitem(spark, dir).select(col("l_partkey").as("k"))
    // ONE corpus pass to the key-count relation; the exact F2 and every
    // CMS cell (cell = Σ cnt over the bucket's keys) derive from it
    val counts = keys.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = counts
      .agg(sum(expr("cnt * cnt")).as("f2_exact"),
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"))
    val est = cmsCellsOf(counts).groupBy(col("ri"))
      .agg(sum(expr("cell * cell")).as("row_est"))
      .agg(min(col("row_est")).as("f2_est"))
    val out = exact.crossJoin(broadcast(est))
      .select(col("n_rows"), col("n_keys"), col("f2_exact"), col("f2_est"),
        // the excess is ~F1²/width — DECIMAL-widened like the bound, or
        // ×10⁶ wraps a long already near 10⁸ rows
        expr("CAST(CAST(f2_est - f2_exact AS DECIMAL(38,0)) * 1000000 " +
          "DIV f2_exact AS BIGINT)").as("err_ppm"),
        expr("CAST(3 * (CAST(n_rows AS DECIMAL(38,0)) * n_rows - f2_exact) " +
          s"* 1000000 DIV ($CmsF2Width * CAST(f2_exact AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("bound_ppm"))
      .withColumn("f2_ok", expr("f2_est >= f2_exact AND err_ppm <= bound_ppm"))
      .localCheckpoint() // 1 row — materialize before releasing the cache
    counts.unpersist()
    out
  }

  /** CMS cell relation from a key-count relation `(k, cnt)`: explode
    * the [[CmsF2Depth]] hash rows and sum COUNTS per bucket — key-
    * bounded input, 4 096-cell-bounded output, never a corpus re-scan.
    * Shared by q230 and q235.
    */
  private def cmsCellsOf(counts: DataFrame): DataFrame = {
    val fp = GraftFunctions.Md5PrefixName
    counts
      .select(col("k"), col("cnt"),
        explode(expr(s"sequence(0, ${CmsF2Depth - 1})")).as("ri"))
      .select(col("ri"), col("cnt"), expr(
        s"$fp(concat(CAST(ri AS STRING), ':', CAST(k AS STRING)), 12) " +
          s"% $CmsF2Width").as("bucket"))
      .groupBy(col("ri"), col("bucket")).agg(sum(col("cnt")).as("cell"))
  }

  /** The q235 join's two fact slices: shipments of these years, keyed
    * by supplier.
    */
  val JoinSizeYearA = 1995
  val JoinSizeYearB = 1996

  /** q235: general join-size estimation from two explicit CMS rows —
    * the companion planner statistic to q230's F2: |A ⋈ B| on a key =
    * Σ_k cntA(k)·cntB(k), estimated as min over [[CmsF2Depth]] rows of
    * the sketch inner product Σ_j cellA_j·cellB_j (Cormode &
    * Muthukrishnan 2005 §4.2). A and B are two year-slices of the fact
    * table keyed by supplier — exactly the shape ("how big is the
    * filtered-fact × filtered-fact join?") a planner must answer
    * before picking a strategy. One-sided by the same cross-term
    * argument as q230; Markov excess bound (F1A·F1B − J)/w per row.
    *
    * Scale: two filtered corpus passes each collapsing to 4 096 cells;
    * the exact side is one keyed join of two key-count relations.
    */
  def cmsJoinSize(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("k"), year(col("l_shipdate")).as("yr"))
    // one filtered pass per side to its key-count relation; the exact
    // join, the marginals, and every CMS cell all derive from those
    def counts(y: Int) = li.filter(col("yr") === y)
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = counts(JoinSizeYearA)
    val cb = counts(JoinSizeYearB)
    val exact = ca.join(cb.withColumnRenamed("cnt", "cnt_b"), Seq("k"))
      .agg(sum(expr("cnt * cnt_b")).as("join_exact"))
      .crossJoin(ca.agg(sum(col("cnt")).as("n_a"),
        count(lit(1)).as("n_keys_a")))
      .crossJoin(cb.agg(sum(col("cnt")).as("n_b"),
        count(lit(1)).as("n_keys_b")))
    val est = cmsCellsOf(ca).withColumnRenamed("cell", "cell_a")
      .join(cmsCellsOf(cb).withColumnRenamed("cell", "cell_b"),
        Seq("ri", "bucket"))
      .groupBy(col("ri")).agg(sum(expr("cell_a * cell_b")).as("row_est"))
      .agg(min(col("row_est")).as("join_est"))
    val out = exact.crossJoin(broadcast(est))
      .select(col("n_a"), col("n_b"), col("n_keys_a"), col("n_keys_b"),
        col("join_exact"), col("join_est"),
        expr("CAST(CAST(join_est - join_exact AS DECIMAL(38,0)) * 1000000 " +
          "DIV join_exact AS BIGINT)").as("err_ppm"),
        expr("CAST(3 * (CAST(n_a AS DECIMAL(38,0)) * n_b - join_exact) " +
          s"* 1000000 DIV ($CmsF2Width * CAST(join_exact AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("bound_ppm"))
      .withColumn("join_ok",
        expr("join_est >= join_exact AND err_ppm <= bound_ppm"))
      .localCheckpoint() // 1 row — materialize before releasing caches
    ca.unpersist(); cb.unpersist()
    out
  }

  /** Equi-width histogram buckets for [[histogramSelectivity]]. */
  val HistBuckets = 64L

  /** q236: range-selectivity estimation from an equi-width histogram —
    * the third planner statistic (q230 F2, q235 join size): build a
    * [[HistBuckets]]-bucket histogram over order totals (cents), then
    * estimate the row count of a range predicate by counting full
    * buckets exactly and interpolating the two partial end buckets
    * uniformly. The range is derived from the observed span (30%–60%
    * of it), so the query is deterministic at any SF. The audit grades
    * the estimator's THEOREM, not a hope: full buckets contribute
    * exactly, so |est − exact| ≤ mass of the two partial buckets.
    *
    * Scale: one aggregation to the bucket histogram (bucket-bounded),
    * one exact-count pass; all interpolation algebra on ≤ 64 rows.
    */
  def histogramSelectivity(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.orders(spark, dir)
      .select(graft.operators.Determinism.cents(col("o_totalprice")).as("v"))
    val span = vals.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"),
      count(lit(1)).as("n_rows"))
    val withB = vals.crossJoin(broadcast(span))
      .withColumn("width", expr(s"(vmax - vmin) DIV $HistBuckets + 1"))
      .withColumn("bucket", expr("(v - vmin) DIV width"))
    val hist = withB.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    // the predicate: [lo, hi] = [min + 30% span, min + 60% span]
    val bounds = span
      .withColumn("lo", expr("vmin + (vmax - vmin) * 3 DIV 10"))
      .withColumn("hi", expr("vmin + (vmax - vmin) * 6 DIV 10"))
      .withColumn("width", expr(s"(vmax - vmin) DIV $HistBuckets + 1"))
    val est = hist.crossJoin(broadcast(bounds))
      .withColumn("b_lo", expr("(lo - vmin) DIV width"))
      .withColumn("b_hi", expr("(hi - vmin) DIV width"))
      .withColumn("b_start", expr("vmin + bucket * width"))
      // per-bucket estimated contribution to [lo, hi]: overlap of the
      // bucket's value interval with the range, uniform within bucket
      .withColumn("overlap", expr(
        "greatest(0L, least(hi, b_start + width - 1) - greatest(lo, b_start) + 1)"))
      .withColumn("contrib", expr("cnt * overlap DIV width"))
      .agg(sum(col("contrib")).as("est"),
        sum(when(expr("bucket = b_lo OR bucket = b_hi"), col("cnt"))
          .otherwise(0L)).as("partial_mass"))
    val exact = vals.crossJoin(broadcast(bounds))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .agg(count(lit(1)).as("exact"))
    bounds.select(col("n_rows"), col("lo"), col("hi"))
      .crossJoin(broadcast(est)).crossJoin(broadcast(exact))
      .select(col("n_rows"), col("lo"), col("hi"), col("est"), col("exact"),
        expr("exact * 1000000 DIV n_rows").as("sel_exact_ppm"),
        expr("est * 1000000 DIV n_rows").as("sel_est_ppm"),
        col("partial_mass"))
      .withColumn("hist_ok", expr("abs(est - exact) <= partial_mass"))
  }
}
