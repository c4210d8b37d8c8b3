package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization, corpus statistics, language-ID
  * heuristics, quality scoring, and content fingerprinting.
  *
  * Everything is built from codegen'd built-ins (`split`, higher-order
  * array functions, `regexp_replace`, `md5`) — no UDFs — so the operators
  * stay inside whole-stage codegen and scale per-partition with no
  * driver involvement. Ratios are quantized to parts-per-million integers
  * (see [[Determinism]]) for cross-engine exactness.
  */
object TextOps {

  /** Whitespace tokenization shared by every operator here. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Normalized content fingerprint (rolling identity for dedup): md5 of
    * the whitespace-collapsed, lower-cased text.
    */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** Per-document surface statistics: token count, character count,
    * punctuation count (chars that are not alphanumeric or space).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("len_chars"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("long").as("n_punct"))

  /** BPE-ish subword token counting: a GPT-style pre-tokenization regex
    * (letter runs, digit runs, punctuation runs, each with optional
    * leading space) counted per document — the cheap `len(text)/~4`
    * upgrade that tracks real tokenizer counts closely without a vocab.
    */
  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"))
          .cast("long").as("n_bpe_tokens"),
        size(tokens(col("text"))).cast("long").as("n_ws_tokens"))

  /** Corpus token frequency — the classic explode→count rollup. Spark
    * does map-side partial aggregation automatically, so the shuffle
    * carries one row per (partition, token), not per occurrence.
    */
  def tokenFrequency(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5)

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und", "das"),
    "zh" -> Seq("shi", "le", "bu", "ma"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Language-ID by stopword-marker voting (n-gram heuristic family):
    * count marker tokens per candidate language, argmax with a fixed
    * tie-break order, then cross-tab predictions against the labeled
    * `lang` column.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
    val scored = markers.foldLeft(docs) { case (df, (l, ws)) =>
      df.withColumn(s"score_$l", markerCount(col("toks"), ws))
    }
    val best = markers.map(_._1).map(l => col(s"score_$l"))
    val pred = markers.map(_._1).foldRight(lit("und")) { case (l, acc) =>
      when(col(s"score_$l") >= greatest(best: _*) && greatest(best: _*) > 0, lit(l)).otherwise(acc)
    }
    // foldRight makes the FIRST matching language win ties (en > es > de > zh)
    scored.withColumn("pred_lang", pred)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
  }

  /** Quality scoring: token count, mean token length and stopword ratio
    * (both in exact ppm), bucketed into quality classes. The bucket rule
    * is a plain CASE so the whole operator is one codegen'd projection +
    * aggregation.
    */
  def qualityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    val df = Tables.documents(spark, dir)
      .withColumn("toks", tokens(col("text")))
      // long arithmetic: INT * 1000000 overflows ANSI mode at ~2148 chars
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("char_total",
        length(regexp_replace(col("text"), "\\s", "")).cast("long"))
      .withColumn("mean_tok_len_ppm", expr("char_total * 1000000 DIV n_tokens"))
      // long arithmetic here too: size() is int32, int*1000000 overflows ANSI
      .withColumn("n_stop", markerCount(col("toks"), stop).cast("long"))
      .withColumn("stop_ratio_ppm", expr("n_stop * 1000000 DIV n_tokens"))
      .withColumn("bucket",
        when(col("n_tokens") < 10, "too_short")
          .when(col("stop_ratio_ppm") > 400000, "boilerplate")
          .when(col("mean_tok_len_ppm") > 9000000, "garbled")
          .otherwise("ok"))
    df.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("min_doc"))
  }

  /** Duplicate-content clusters by exact normalized fingerprint. */
  def fingerprintClusters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_dups") > 1)

  /** Exact dedup, keep-first policy: the surviving doc_id per fingerprint
    * cluster (deterministic min, not an arbitrary `dropDuplicates` pick).
    */
  def dedupKeepFirst(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

  /** Incremental exact dedup: the surviving doc_ids of a NEW batch
    * against an already-curated corpus — the recurring-crawl shape at
    * 100 TB, where the corpus is orders of magnitude larger than the
    * batch. A batch row survives iff its normalized-content fingerprint
    * (a) does not exist in the corpus and (b) is first within the batch
    * (min doc_id).
    *
    * Scale: the corpus side collapses to DISTINCT 16-byte fingerprints
    * before the anti-join, so the corpus's text never shuffles — only
    * its hash set. For a recurring pipeline, persist that fingerprint
    * set bucketed by `fp` ([[graft.lake.Bucketing]]) and the daily
    * anti-join needs no corpus-side exchange at all.
    */
  def dedupAgainstCorpus(newBatch: DataFrame, corpus: DataFrame): DataFrame = {
    val nb = newBatch.withColumn("fp", fingerprint(col("text")))
    val seen = corpus.select(fingerprint(col("text")).as("fp")).distinct()
    nb.join(seen, Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
  }

  /** [[dedupAgainstCorpus]] over the documents table, full-re-crawl
    * shape: the batch is the whole dump, the corpus is the 4/5 already
    * ingested (`doc_id % 5 <> 0`) — so survivors are exactly the genuinely
    * new 1/5 plus natural content dups resolved keep-first.
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    dedupAgainstCorpus(docs, docs.filter(col("doc_id") % 5 =!= 0))
  }
}
