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

  /** Per-document token-rarity score (q85) — an integer surprisal proxy
    * for quality/novelty scoring without a language model: each token
    * occurrence is weighted by its inverse corpus frequency
    * `idf_x = grand_total DIV count(token)` (a hapax scores the corpus
    * size, "the" scores ~single digits), and the document score is the
    * mean weight. Pure integer arithmetic — no log, no floats — so the
    * score is bit-identical across engines and partitionings, unlike a
    * float log-prob whose sum order matters.
    *
    * Plan: the q67/q82 house shape — one window count over the token
    * partition (occurrence rows; the window is sort-spilling, a
    * corpus-frequent token only grows one partition), the 1-row grand
    * total broadcast in, one per-doc aggregation. Two data shuffles, no
    * join of corpus-sized relations.
    */
  def tokenRarityScore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val grand = t.agg(count(lit(1)).as("grand"))
    t.withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(grand))
      .withColumn("idf_x", expr("grand DIV cnt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("idf_x")).as("sum_idf"),
        max(col("idf_x")).as("max_idf"))
      .withColumn("rarity_score", expr("sum_idf DIV n_tok"))
      .select(col("doc_id"), col("n_tok"), col("sum_idf"),
        col("max_idf"), col("rarity_score"))
  }

  /** Per-source token-distribution divergence (q92) — total-variation
    * distance in ppm between each source's token distribution and the
    * whole-corpus distribution, the drift diagnostic a data-mixing
    * pipeline watches per shard/crawl/date: a source whose TV jumps is
    * contributing different text than the mix was tuned for. Pure
    * integer arithmetic (ppm floors, no log), so the score is
    * bit-identical across engines — unlike float KL whose sum order
    * drifts.
    *
    * TV needs the sum over ALL corpus tokens including those absent
    * from a source, but absent tokens contribute exactly their global
    * share, so `TV_s = Σ_present |p_s − p_g| + (Σ_all p_g − Σ_present
    * p_g)` — only (source, token) rows that exist are ever joined; no
    * source × vocabulary expansion.
    *
    * Plan: one explode → (source, token) count with map-side combine;
    * the global distribution re-aggregated FROM those counts (the
    * corpus is tokenized once); one token-keyed equi-join of two
    * token-aggregated relations; per-source rollup. No corpus-sized
    * join, no cross product.
    */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame =
    sourceDivergenceFor(Tables.documents(spark, dir))

  /** [[sourceDivergence]] over an explicit `(source, text)` relation. */
  def sourceDivergenceFor(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val stot = st.groupBy(col("source")).agg(sum(col("c_st")).as("t_s"))
    val g = st.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val grand = g.agg(sum(col("c_t")).as("grand"))
    val gp = g.crossJoin(broadcast(grand))
      .withColumn("p_g", expr("c_t * 1000000 DIV grand"))
    val gTot = gp.agg(sum(col("p_g")).as("g_ppm_total"))
    st.join(broadcast(stot), Seq("source"))
      .withColumn("p_s", expr("c_st * 1000000 DIV t_s"))
      .join(gp.select(col("token"), col("p_g")), Seq("token"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        max(col("t_s")).as("tok_total"),
        sum(abs(col("p_s") - col("p_g"))).as("present_abs"),
        sum(col("p_g")).as("present_pg"))
      .crossJoin(broadcast(gTot))
      .withColumn("tv_ppm", expr("present_abs + (g_ppm_total - present_pg)"))
      .select(col("source"), col("n_tokens"), col("tok_total"), col("tv_ppm"))
  }

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

  /** q241: per-class precision / recall / F1 (exact ppm) over the q33
    * lang-ID confusion — the standard classifier scorecard a pipeline
    * reads before TRUSTING a heuristic labeler for routing or
    * filtering: accuracy alone hides a class the model never predicts.
    * One row per true class; precision uses the PREDICTED marginal
    * (tp+fp), recall the true marginal, F1 the q222 ppm harmonic rule.
    *
    * Scale: rides the q33 confusion relation (classes² rows at most);
    * everything here is label-bounded algebra.
    */
  def langIdPrf(spark: SparkSession, dir: String): DataFrame =
    confusionPrfFor(langIdConfusion(spark, dir))

  def confusionPrfFor(cm: DataFrame): DataFrame = {
    val rowM = cm.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
    val colM = cm.groupBy(col("pred_lang")).agg(sum(col("n")).as("n_pred"))
    val tp = cm.filter(col("lang") === col("pred_lang"))
      .select(col("lang"), col("n").as("tp"))
    rowM
      .join(broadcast(tp), Seq("lang"), "left_outer")
      .join(broadcast(colM.withColumnRenamed("pred_lang", "lang")),
        Seq("lang"), "left_outer")
      .na.fill(0L, Seq("tp", "n_pred"))
      .select(col("lang"), col("n_true"), col("n_pred"), col("tp"),
        expr("CASE WHEN n_pred = 0 THEN 0 " +
          "ELSE tp * 1000000 DIV n_pred END").as("precision_ppm"),
        expr("tp * 1000000 DIV n_true").as("recall_ppm"))
      .withColumn("f1_ppm", expr(
        "CASE WHEN precision_ppm + recall_ppm = 0 THEN 0 " +
          "ELSE 2 * precision_ppm * recall_ppm DIV " +
          "(precision_ppm + recall_ppm) END"))
  }

  /** q242: Cohen's kappa (1960) over the same confusion — the
    * chance-corrected agreement that accuracy is NOT: on a corpus
    * where one language dominates, always-predict-it scores high
    * accuracy and kappa ≈ 0. Exact contract: po_ppm = agree·10⁶ div n;
    * pe_ppm = (Σ_label row·col)·10⁶ div n² (HUGEINT/DECIMAL — n²
    * overflows a long at 3×10⁹ docs); kappa_ppm =
    * (po_ppm − pe_ppm)·10⁶ div (10⁶ − pe_ppm), NULL at pe = 1.
    */
  def langIdKappa(spark: SparkSession, dir: String): DataFrame =
    confusionKappaFor(langIdConfusion(spark, dir))

  def confusionKappaFor(cm: DataFrame): DataFrame = {
    val rowM = cm.groupBy(col("lang").as("label"))
      .agg(sum(col("n")).as("n_row"))
    val colM = cm.groupBy(col("pred_lang").as("label"))
      .agg(sum(col("n")).as("n_col"))
    val peNum = rowM.join(colM, Seq("label"))
      .agg(sum(expr("CAST(n_row AS DECIMAL(38,0)) * n_col")).as("pe_num"))
    cm.agg(sum(col("n")).as("n_docs"),
        sum(when(col("lang") === col("pred_lang"), col("n"))
          .otherwise(0L)).as("agree"))
      .crossJoin(broadcast(peNum))
      .select(col("n_docs"), col("agree"),
        expr("agree * 1000000 DIV n_docs").as("po_ppm"),
        expr("CAST(pe_num * 1000000 DIV " +
          "(CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)").as("pe_ppm"))
      // DuckDB's `//` TRUNCATES toward zero for negatives exactly like
      // Spark's DIV (verified on DuckDB 1.0.0: -7 // 2 = -3), so no
      // correction term: the one previously here FLOORED negative kappa
      // and broke the sf0.001 hash by 1 ppm (worse-than-chance kappa
      // with a nonzero remainder — unreached at the larger SFs)
      .withColumn("kappa_ppm", expr(
        "CASE WHEN pe_ppm = 1000000 THEN NULL " +
          "ELSE (po_ppm - pe_ppm) * 1000000 DIV (1000000 - pe_ppm) END"))
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

  // --- winnowed rolling-hash fingerprints (SIGMOD'03 winnowing) ---

  val WinnowK = 5
  val WinnowW = 4
  /** Report a pair when shared/min(n_fp) clears this (ppm). */
  val WinnowScorePpm = 500000L

  /** Sorted distinct winnowed fingerprints of the normalized text — the
    * native O(n) rolling-hash [[graft.functions.WinnowedFingerprints]]
    * over the same whitespace/case normalization as [[fingerprint]].
    */
  def winnowFps(c: Column): Column =
    call_function(graft.functions.GraftFunctions.WinnowName,
      lower(regexp_replace(trim(c), "\\s+", " ")), lit(WinnowK), lit(WinnowW))

  /** Per-document winnow profile (q63): fingerprint count and range.
    * Docs too short to fingerprint (< k+w-1 normalized chars) drop out.
    */
  /** Char-trigram frequency quality score (q130) — an integer-exact
    * perplexity PROXY: how "ordinary" each document's character
    * sequences are under a model trained on the train split (q48's md5
    * hash rule, < 0.8). No logarithms — a log-likelihood would hang the
    * cross-engine contract on libm's last ulp — instead each trigram
    * contributes its train-corpus frequency in exact ppm, and the score
    * is the per-document mean. Garbage text, wrong-alphabet content,
    * and byte noise sit at the bottom of the distribution exactly as
    * with a real LM perplexity filter; thresholds compose with the
    * Gopher gates (q100).
    *
    * Scale shape: the trigram explode is linear in corpus chars (the
    * tokenization cost class); the model table is bounded by the
    * trigram VOCABULARY (≤ charset³ — thousands at 100 TB, not
    * corpus-sized), so the score join broadcasts and the whole query is
    * scan + one bounded-key aggregation + map-side join + per-doc
    * aggregation. Trigrams unseen in training contribute 0 (left join),
    * the honest unsmoothed answer.
    */
  def charTrigramQuality(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // native one-pass generator: value-identical to
    // transform(sequence(1, length-2), i -> substring(text, i, 3)) but
    // O(len) instead of O(len²) — each substring(text, i, …) re-walks
    // the UTF-8 prefix to find codepoint i, and BOTH sides of this
    // query explode every position of every document
    val tris = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), explode(expr(
        s"${graft.functions.GraftFunctions.CharNgramsName}(text, 3)")).as("tg"))
    val model = tris
      .filter(Sampling.hashBucket("doc_id") < 800000L)
      .groupBy(col("tg")).agg(count(lit(1)).as("n_tg"))
    val totalDf = model.agg(sum(col("n_tg")).as("n_total"))
    tris
      .join(broadcast(model), Seq("tg"), "left_outer")
      .na.fill(0L, Seq("n_tg"))
      .crossJoin(broadcast(totalDf))
      // DECIMAL-widened ppm: n_tg * 1e6 overflows BIGINT at corpus scale
      .withColumn("ppm",
        expr("CAST(CAST(n_tg AS DECIMAL(38,0)) * 1000000 DIV n_total AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tri"), sum(col("ppm")).as("ppm_sum"))
      .select(col("doc_id"), col("n_tri"),
        expr("ppm_sum DIV n_tri").as("avg_freq_ppm"))
  }

  def winnowProfile(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), winnowFps(col("text")).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
  }

  /** A test doc is flagged when this share (ppm) of its winnowed
    * fingerprints also appears in the train split.
    */
  val ContamPpm = 500000L

  /** Train/eval contamination check (q78) — the decontamination pass
    * every benchmark-respecting training pipeline runs: find eval-split
    * documents whose content substantially overlaps the train split, via
    * the same winnowed fingerprints as q63/q64. Splits are the
    * deterministic key-hash buckets of [[Sampling.split]] (train < 0.8,
    * test ≥ 0.9), so the check composes with the real split operator.
    *
    * Scale: the train side collapses to DISTINCT fingerprint longs
    * before the join — the q61 incremental-dedup shape, not a pair
    * explosion. The test side (eval sets are small by construction)
    * explodes to (doc, fp) and semi-joins on the fingerprint hash; one
    * shuffle each side, no doc×doc work anywhere.
    */
  def contaminationCheck(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // bucket-filter FIRST (cheap md5 on the key), winnow once per
    // surviving row; fingerprint-less docs vanish in the explode, so no
    // size() filter that would re-evaluate the winnow in a Filter node
    val docs = Tables.documents(spark, dir)
    val trainFps = docs.filter(Sampling.hashBucket("doc_id") < 800000L)
      .select(explode(winnowFps(col("text"))).as("fp")).distinct()
    val testFps = docs.filter(Sampling.hashBucket("doc_id") >= 900000L)
      .select(col("doc_id"), winnowFps(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
        explode(col("fps")).as("fp"))
    // winnowFps is distinct per doc, so count(1) = distinct shared fps
    testFps.join(trainFps, Seq("fp"), "left_semi")
      .groupBy(col("doc_id"), col("n_fp"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("contam_ppm", expr("n_shared * 1000000 DIV n_fp"))
      .filter(col("contam_ppm") >= ContamPpm)
  }

  /** Decontaminated train corpus (q84) — the other direction of q78,
    * and the one production pipelines actually apply: drop from the
    * TRAIN split any document that substantially overlaps the eval
    * split, and emit the kept docs with their overlap evidence. The
    * overlap unit is the token 3-gram shingle (the GPT-3-style n-gram
    * decontamination unit, same hashes as q37/q82) rather than q78's
    * char-gram winnow fingerprints: char 5-grams over a narrow
    * vocabulary collide near-totally, while token shingles measure
    * actual phrase reuse. A train doc is dropped when ≥ [[ContamPpm]]
    * of its shingles appear in the eval split; docs too short to
    * shingle carry no eval phrase and are kept with n_eval_hits = 0.
    *
    * Scale: mirror image of [[contaminationCheck]] — the (small) eval
    * split collapses to DISTINCT shingle hashes and BROADCASTS; the
    * (huge) train side explodes to (doc, shash) and left-joins against
    * it map-side, then re-aggregates per doc. The train corpus shuffles
    * once (the per-doc groupBy); no shingle-keyed shuffle of the big
    * side, no doc×doc work.
    */
  def decontaminateTrain(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
    val ev = Dedup.hashedShingles(docs.filter(Sampling.hashBucket("doc_id") >= 900000L))
      .select(col("shash")).distinct()
      .withColumn("hit", lit(1L))
    // total over ALL train docs: guarded shingle expr (sequence(1, n)
    // DESCENDS when n < 1, so the >= 3 case split is load-bearing)
    // instead of docShingles' dropping filter
    val tr = docs.filter(Sampling.hashBucket("doc_id") < 800000L)
      .withColumn("toks", tokens(col("text")))
      .withColumn("sh_arr", when(size(col("toks")) >= 3,
        array_distinct(expr(
          "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', " +
            "element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))")))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))
      .select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"),
        explode_outer(col("sh_arr")).as("sh")) // outer: keep shingle-less docs
      .withColumn("shash",
        expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(sh, 15)"))
    tr.join(broadcast(ev), Seq("shash"), "left_outer")
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_eval_hits"))
      .withColumn("contam_ppm",
        expr("CASE WHEN n_sh = 0 THEN 0 ELSE n_eval_hits * 1000000 DIV n_sh END"))
      .filter(col("contam_ppm") < ContamPpm)
      .select(col("doc_id"), col("n_sh"), col("n_eval_hits"), col("contam_ppm"))
  }

  /** n-gram sizes the q243 decontamination sweep measures. */
  val DecontamSweepNs: Seq[Int] = Seq(2, 3, 5)

  /** q243: the decontamination-aggressiveness curve — q84 applies ONE
    * n-gram size (token 3-grams, the GPT-3 unit); this measures what
    * the choice costs at each n ∈ [[DecontamSweepNs]]: flagged train
    * docs, the flagged character mass, and the eval-side distinct-gram
    * pool. Short grams collide on common phrases and over-delete
    * (recall of eval leakage at the price of train mass); long grams
    * under-flag. The curve is how a pipeline picks n with its token
    * budget in view — the q227/q228 sweep discipline applied to the
    * contamination knob.
    *
    * Scale: per sweep point, the q84 plan verbatim (eval collapses to
    * distinct hashes and broadcasts; the train side explodes map-side
    * and re-aggregates per doc); three sweep points = three corpus
    * passes, each summary-bounded. Never a shingle-keyed shuffle of
    * the train side.
    */
  def decontamSweep(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val fp = graft.functions.GraftFunctions.Md5PrefixName
    val docs = Tables.documents(spark, dir)
    def grams(n: Int) = when(size(col("toks")) >= n,
      array_distinct(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> array_join(slice(toks, i, $n), ' '))")))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    val perN = DecontamSweepNs.map { n =>
      val ev = docs.filter(Sampling.hashBucket("doc_id") >= 900000L)
        .withColumn("toks", tokens(col("text")))
        .select(explode(grams(n)).as("g"))
        .select(expr(s"$fp(g, 15)").as("ghash")).distinct()
      val evCount = ev.agg(count(lit(1)).as("n_eval_grams"))
      val tr = docs.filter(Sampling.hashBucket("doc_id") < 800000L)
        .withColumn("toks", tokens(col("text")))
        .select(col("doc_id"), col("n_chars"), grams(n).as("gs"))
        .select(col("doc_id"), col("n_chars"),
          size(col("gs")).cast("long").as("n_g"),
          explode_outer(col("gs")).as("g"))
        .withColumn("ghash", expr(s"$fp(g, 15)"))
      tr.join(broadcast(ev.withColumn("hit", lit(1L))), Seq("ghash"),
          "left_outer")
        .groupBy(col("doc_id"), col("n_chars"), col("n_g"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .withColumn("flagged", expr("CASE WHEN n_g = 0 THEN 0 " +
          s"WHEN n_hits * 1000000 DIV n_g >= $ContamPpm THEN 1 " +
          "ELSE 0 END"))
        .agg(count(lit(1)).as("n_train"),
          sum(col("flagged")).as("n_flagged"),
          sum(expr("flagged * n_chars")).as("flagged_chars"))
        .crossJoin(broadcast(evCount))
        .select(lit(n).as("gram_n"), col("n_train"), col("n_flagged"),
          expr("n_flagged * 1000000 DIV n_train").as("flagged_ppm"),
          col("flagged_chars"), col("n_eval_grams"))
    }
    perN.reduce(_.unionAll(_))
  }

  /** Winnow-overlap pairs (q64, the MOSS shape): documents in the same
    * source whose shared fingerprint count is ≥ [[WinnowScorePpm]] of
    * the smaller document's fingerprint set — local substring overlap
    * that token-shingle Jaccard dilutes away on long documents. Same
    * 100 TB plan as the shingle family: bucket-local pair emission on
    * (source, fp) with the document-frequency cap, no join.
    */
  def winnowOverlapPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.expressions.Window
    val dfCap = Dedup.DfCap
    val e = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), winnowFps(col("text")).as("fps"))
      .select(col("doc_id"), col("source"),
        size(col("fps")).cast("long").as("n_fp"),
        explode_outer(col("fps")).as("fp")) // outer: see Dedup.shingles
      .filter(col("fp").isNotNull)
    val w = Window.partitionBy(col("source"), col("fp")).orderBy(col("doc_id"))
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= dfCap + 1)
      .groupBy(col("source"), col("fp"))
      .agg(collect_list(struct(col("doc_id"), col("n_fp"))).as("docs"))
      .filter(size(col("docs")).between(2, dfCap))
      .select(explode(expr(
        "flatten(transform(docs, a -> " +
          "transform(filter(docs, b -> b.doc_id > a.doc_id), " +
          "b -> struct(a.doc_id AS doc_a, b.doc_id AS doc_b, " +
          "a.n_fp AS n_a, b.n_fp AS n_b))))")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("score_ppm", expr("shared * 1000000 DIV least(n_a, n_b)"))
      .filter(col("score_ppm") >= WinnowScorePpm)
      .select(col("doc_a"), col("doc_b"), col("score_ppm"))
  }

  /** Denylist for [[denylistScrub]]. In production this is a loaded
    * wordlist (NSFW/toxicity/blocked-entity terms) broadcast to the
    * scan; here a fixed slice of the synthetic vocabulary so the
    * detector branch actually exercises. The mechanism — broadcast
    * membership filter inside a single corpus scan — is the scale
    * contract; the list contents are config.
    */
  val Denylist: Seq[String] = Seq("customer", "stream", "vector")

  /** Flagged-mass share (ppm of a doc's tokens) above which the doc is
    * blocked outright rather than scrubbed.
    */
  val DenyBlockPpm = 100000L

  /** Denylisted-term scrub (q141) — the safety/content-filtering stage
    * of a curation pipeline (wordlist blocking), distinct from the
    * STATISTICAL quality gates (q34/q100): per document, count tokens
    * on the denylist, then verdict `block` (flagged share above
    * [[DenyBlockPpm]]), `scrub` (any hit — the doc survives minus its
    * flagged tokens), or `clean`; rolled up per (source, verdict) with
    * exact token mass. Integer ppm throughout, so the verdict boundary
    * is bit-stable cross-engine.
    *
    * Plan: one corpus scan, the denylist folded into the row predicate
    * (a literal IN-list here; a broadcast join for a list too large to
    * inline) — no shuffle before the tiny (source × verdict) rollup.
    */
  def denylistScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("n_flagged",
        size(filter(col("toks"), t => t.isin(Denylist: _*))).cast("long"))
      .withColumn("flag_ppm", expr("n_flagged * 1000000 DIV n_tok"))
      .withColumn("verdict",
        when(col("flag_ppm") > DenyBlockPpm, lit("block"))
          .when(col("n_flagged") > 0, lit("scrub"))
          .otherwise(lit("clean")))
      .groupBy(col("source"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tok_total"),
        sum(col("n_flagged")).as("flagged_total"))

  /** PII patterns for [[piiScrub]]. Deliberately written in the regex
    * subset Java (Spark) and RE2 (DuckDB, the oracle) evaluate
    * identically — character classes, bounded repetition, `\b`, no
    * lookaround — so redaction is bit-stable cross-engine. In
    * production these are a maintained pattern pack; the three here
    * (email, NANP-style phone, dotted-quad IPv4) are the canonical
    * trio every corpus-scrub pass starts from.
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhoneRe = "\\+1-\\d{3}-\\d{4}"
  val PiiIpv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-row PII detection + redaction: appends match counts (taken
    * BEFORE redaction) and the scrubbed text with each PII class
    * replaced by its placeholder. Email runs first so its digits/dots
    * can't be re-matched as phone/IP fragments. Pure codegen'd
    * `regexp_extract_all`/`regexp_replace` — per-row work, no shuffle,
    * no UDF: at 100 TB this is a map stage fused into the scan.
    */
  def piiScrub(df: DataFrame, textCol: String): DataFrame =
    df
      .withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(PiiEmailRe), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PiiPhoneRe), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(col(textCol), lit(PiiIpv4Re), lit(0))).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), PiiEmailRe, "<EMAIL>"),
            PiiPhoneRe, "<PHONE>"),
          PiiIpv4Re, "<IP>"))

  /** PII redaction report (q144) — the safety-scrub stage of a curation
    * pipeline, graded end-to-end: a contact-card corpus is derived
    * deterministically from `customer` (name + synthetic email, phone,
    * last-seen IP, all functions of `c_custkey`, so the oracle derives
    * the identical corpus and the redactor has real matches to find),
    * [[piiScrub]] redacts it, and the rollup carries a per-segment sum
    * of a 48-bit fingerprint of every scrubbed row — the redacted TEXT
    * itself is under the hash gate, not just the match counts.
    *
    * Plan: one scan of `customer`, all per-row (derive → count → redact
    * → fingerprint) fused into the scan stage, one tiny rollup shuffle
    * on `c_mktsegment`.
    */
  def piiRedactionReport(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val contacts = Tables.customer(spark, dir)
      .select(col("c_mktsegment"),
        concat(
          col("c_name"), lit(" ("), col("c_mktsegment"),
          lit(") contact cust"), col("c_custkey").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("c_custkey") % 10000L).cast("string"), 4, "0"),
          lit(" last seen 10."), (col("c_custkey") % 256L).cast("string"),
          lit("."), ((col("c_custkey") * 7L) % 256L).cast("string"),
          lit("."), ((col("c_custkey") * 13L) % 256L).cast("string"))
          .as("text"))
    piiScrub(contacts, "text")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("emails"),
        sum(col("n_phones")).as("phones"),
        sum(col("n_ips")).as("ips"),
        sum(length(col("text")).cast("long")).as("chars_before"),
        sum(length(col("scrubbed")).cast("long")).as("chars_after"),
        sum(expr(
          s"${graft.functions.GraftFunctions.Md5PrefixName}(scrubbed, 12)"))
          .as("fp_sum"))
  }

  /** Conditional character-bigram language-model scoring (q170) — the
    * CCNet/KenLM perplexity-filter posture in an exact integer
    * contract. Where q130 scores documents by MARGINAL n-gram frequency
    * (how common are this doc's trigrams), this trains a first-order
    * Markov model over characters — p(c₂|c₁) = count(c₁c₂)/count(c₁·)
    * on the 80% hash-split train corpus, in floor-div ppm — and scores
    * each document by its mean transition surprisal Σ(10⁶ − p_ppm)/n:
    * the deterministic stand-in for per-character negative
    * log-likelihood, the statistic CCNet thresholds to drop
    * gibberish/boilerplate. Unseen transitions (and transitions whose
    * context character never appears in train) score the maximum 10⁶.
    *
    * Scale: one explode pass over corpus characters (the native O(len)
    * [[graft.functions.CharNgrams]] generator); the model is
    * alphabet²-bounded, so both model joins BROADCAST and the score is
    * a map-side projection plus one doc-keyed partial aggregation —
    * the same shape as q130, linear in corpus bytes at 100 TB.
    */
  def charBigramNll(spark: SparkSession, dir: String): DataFrame =
    charBigramNllFor {
      graft.functions.GraftFunctions.ensureRegistered(spark)
      Tables.documents(spark, dir)
    }

  def charBigramNllFor(docs: DataFrame): DataFrame = {
    val bgs = docs
      .filter(length(col("text")) >= 2)
      .select(col("doc_id"), explode(expr(
        s"${graft.functions.GraftFunctions.CharNgramsName}(text, 2)")).as("bg"))
    val model = bgs
      .filter(Sampling.hashBucket("doc_id") < 800000L)
      .groupBy(col("bg")).agg(count(lit(1)).as("n_bg"))
    // context totals derive from the model relation itself, so the
    // conditional is exactly count(bigram)/count(prefix) over train
    val pre = model
      .groupBy(substring(col("bg"), 1, 1).as("pre"))
      .agg(sum(col("n_bg")).as("n_pre"))
    bgs
      .join(broadcast(model), Seq("bg"), "left_outer")
      .na.fill(0L, Seq("n_bg"))
      .withColumn("pre", substring(col("bg"), 1, 1))
      .join(broadcast(pre), Seq("pre"), "left_outer")
      .na.fill(0L, Seq("n_pre"))
      // DECIMAL-widened ppm: n_bg * 1e6 overflows BIGINT at corpus scale
      .withColumn("cond_ppm", when(col("n_pre") > 0L,
        expr("CAST(CAST(n_bg AS DECIMAL(38,0)) * 1000000 DIV n_pre AS BIGINT)"))
        .otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bg"),
        sum(lit(1000000L) - col("cond_ppm")).as("sur_sum"))
      .select(col("doc_id"), col("n_bg"),
        expr("sur_sum DIV n_bg").as("avg_surprisal_ppm"))
  }

  /** Mass-weighted corpus deciles (q204) — "half the corpus BYTES live
    * in documents longer than X": deciles of document length weighted
    * by the length itself (char mass), the statistic that sizes
    * chunking/packing budgets where the PLAIN decile (q71's rule)
    * answers the wrong question — most documents are short, but most
    * mass is in the long tail. Same histogram discipline as q187/q192:
    * the weighted rank runs on the value-bounded (n_chars → count)
    * relation, position rule pos_k = (W−1)·k DIV 10 + 1 on the mass
    * total W, decile value = min length with cumulative mass ≥ pos.
    */
  def massWeightedDeciles(spark: SparkSession, dir: String): DataFrame =
    massWeightedDecilesFor(Tables.documents(spark, dir))

  def massWeightedDecilesFor(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs.groupBy(col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", expr("CAST(n_chars AS DECIMAL(38,0)) * cnt"))
    val byV = Window.orderBy(col("n_chars"))
    val cum = hist
      .withColumn("cum_w", sum(col("w")).over(
        byV.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_w", sum(col("w")).over(Window.partitionBy()))
    val positions = cum.select(col("tot_w")).distinct()
      .select(col("tot_w"), explode(sequence(lit(1L), lit(9L))).as("decile"))
      .select(col("decile"),
        expr("(tot_w - 1) * decile DIV 10 + 1").as("pos"))
    cum.join(broadcast(positions), col("cum_w") >= col("pos"))
      .groupBy(col("decile"))
      .agg(min(col("n_chars")).as("n_chars"),
        max(col("tot_w")).cast("long").as("total_mass"))
  }

  /** Cross-source quantile normalization (q187) — the calibration step
    * between per-source scoring and a GLOBAL quality threshold: raw
    * score distributions differ by source (a forum and an encyclopedia
    * have incomparable length/quality scales), so each document's score
    * is replaced by its WITHIN-SOURCE percentile before any global cut
    * ([[CorpusPrep.adaptiveQualityFloor]] (q171) fixes one quantile per source;
    * this is the full rank transform).
    *
    * Scale posture: the rank is computed on the per-source SCORE
    * HISTOGRAM, never by sorting documents — scores (n_chars) are
    * value-bounded, so the histogram is metadata-sized and the window
    * runs there (the q176 histogram-threshold discipline). Ties share
    * the min-rank percentile (the standard for quantile normalization),
    * which is exactly what the histogram yields: norm_ppm =
    * docs-strictly-below · 10⁶ DIV (n_source − 1). A corpus-scale
    * window over documents never appears, so there is no per-source
    * skew hazard at 1000 executors.
    *
    * Output per (source, decile of the normalized score): document
    * count and raw-score span — near-uniform counts per source
    * certify the calibration regardless of raw distribution shape.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame =
    quantileNormalizeFor(Tables.documents(spark, dir))

  def quantileNormalizeFor(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs
      .groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("cnt"))
    val bySrc = Window.partitionBy(col("source")).orderBy(col("n_chars"))
    val all = Window.partitionBy(col("source"))
    hist
      .withColumn("below", coalesce(sum(col("cnt")).over(
        bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src", sum(col("cnt")).over(all))
      .withColumn("norm_ppm", expr(
        "below * 1000000 DIV greatest(n_src - 1, CAST(1 AS BIGINT))"))
      .withColumn("decile",
        expr("least(norm_ppm DIV 100000, CAST(9 AS BIGINT))"))
      .groupBy(col("source"), col("decile"))
      .agg(sum(col("cnt")).as("n_docs"),
        min(col("n_chars")).as("min_score"),
        max(col("n_chars")).as("max_score"))
  }

  /** Zipf rank-frequency fit (q220) — the vocabulary-health probe: a
    * natural corpus's token frequencies follow f(r) ∝ r^(−s) with
    * s ≈ 1; a far-flatter or far-steeper fitted slope flags template
    * spam or vocabulary collapse before any model sees the data. To
    * stay byte-identical across engines, the log-log regression runs
    * on FLOOR-LOG2 coordinates — `length(bin(n)) − 1`, pure integers,
    * the same `bin` builtin on Spark and DuckDB — through q185's exact
    * normal-equation algebra (slope/intercept/r² in ppm, DECIMAL-38
    * widened).
    *
    * Scale: one corpus pass to the VOCAB-bounded frequency relation;
    * the rank window and the regression both run there. Output is one
    * row. Binned-log coordinates cost fit precision (each octave
    * collapses), not determinism — the health-screen verdict s ≈ −1
    * survives the quantization.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFitFor(Tables.documents(spark, dir))

  def zipfFitFor(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs
      .select(explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val ranked = freq
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("token").asc)).cast("long"))
      .select(expr("length(bin(rank)) - 1").as("x"),
        expr("length(bin(n)) - 1").as("y"))
    ranked
      .agg(count(lit(1)).as("n_pts"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("num",
        expr("CAST(n_pts AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
      .withColumn("den_x",
        expr("CAST(n_pts AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"))
      .withColumn("den_y",
        expr("CAST(n_pts AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy"))
      .select(col("n_pts"),
        expr("CASE WHEN den_x = 0 THEN NULL " +
          "ELSE CAST(num * 1000000 DIV den_x AS BIGINT) END").as("slope_ppm"),
        expr("CASE WHEN den_x = 0 THEN NULL ELSE CAST((CAST(sy AS DECIMAL(38,0)) " +
          "* sxx - CAST(sx AS DECIMAL(38,0)) * sxy) * 1000000 DIV den_x AS BIGINT) " +
          "END").as("intercept_ppm"),
        expr("CASE WHEN den_x = 0 OR den_y = 0 THEN NULL " +
          "ELSE CAST(((num * 1000000 DIV den_x) * num) DIV den_y AS BIGINT) END")
          .as("r2_ppm"))
  }

  /** Minimum distinct-document frequency for a shingle to count as
    * boilerplate in [[boilerplateDensity]]: present in ≥ this many
    * documents.
    */
  val BoilerMinDf = 3L

  /** Cross-document boilerplate density (q208): the share of each
    * document's distinct 3-token shingles that recur in at least
    * [[BoilerMinDf]] documents — headers, footers, navigation chrome,
    * license blocks. Curation drops or down-weights high-density docs:
    * repetition ACROSS documents is template noise even when each doc
    * passes the intra-document repetition screen (q66).
    *
    * Scale design: rides the ONE hashed-shingle relation the whole
    * dedup family shares ([[Dedup.hashedShingles]] — md5 once per
    * (doc, distinct shingle)); document frequency is a shingle-keyed
    * aggregation and rejoins the shingle relation ON ITS OWN KEY, so
    * the plan is scan → two keyed shuffles (shash, then doc_id) — no
    * broadcast of a corpus-sized side, no window over the corpus. The
    * density is exact-integer ppm over the doc's distinct-shingle count.
    */
  def boilerplateDensity(spark: SparkSession, dir: String): DataFrame =
    boilerplateDensityFor(Tables.documents(spark, dir))

  def boilerplateDensityFor(docs: DataFrame): DataFrame = {
    val hs = Dedup.hashedShingles(docs)
      .select(col("doc_id"), col("n_sh"), col("shash"))
    // (doc_id, shash) is distinct by construction (per-doc list_distinct),
    // so COUNT(*) per shash IS the distinct-document frequency
    val dfreq = hs.groupBy(col("shash")).agg(count(lit(1)).as("df"))
    hs.join(dfreq, Seq("shash"))
      .groupBy(col("doc_id"), col("n_sh"))
      .agg(sum(when(col("df") >= BoilerMinDf, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_sh"), col("n_boiler"),
        expr("n_boiler * 1000000 DIV n_sh").as("boiler_ppm"))
  }
}
