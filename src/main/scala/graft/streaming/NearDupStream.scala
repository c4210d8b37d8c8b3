package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming near-duplicate screen — the continuous twin of the batch
  * incremental LSH screen (q89, [[Dedup.incrementalLshPairs]]): a crawl
  * stream is screened against an ALREADY-BANDED static corpus, emitting
  * a candidate row per shared LSH band.
  *
  * Why this shape scales:
  *  - The per-document MinHash signature is computed STATELESSLY per
  *    row (the whole document is one row, so each band key is a pure
  *    projection — no streaming aggregation, no state store). The
  *    array-form signature provably equals the batch explode+groupBy
  *    form: min over a document's shingle multiset is min over its
  *    distinct shingle set, and both use the same md5/affine constants
  *    ([[Dedup.MinhashA]]/[[Dedup.MinhashB]]), so the two paths cannot
  *    drift.
  *  - The corpus side is banded and CAPPED once in batch (the same
  *    `BandCap`-per-bucket window as q89's corpus side) and joined
  *    stream–static: no streaming state, re-reads of the (small) band
  *    relation per micro-batch, broadcast when it fits.
  *  - Output is append-only per-band candidate rows. The (tiny) pair
  *    rollup to `n_bands` is left to wherever the hits land (the batch
  *    side of the lake, a foreachBatch sink): band keys carry no event
  *    time, so an in-stream pair aggregation would accumulate state no
  *    watermark could ever evict — the same reason the batch path owns
  *    exact cross-horizon dedup in [[DocStream]].
  *
  * Unlike the batch q89, the STREAM side is not band-capped: a cap
  * across micro-batches would itself be unbounded state. Each
  * micro-batch is bounded by `maxFilesPerTrigger` instead, and the
  * corpus-side cap still bounds every bucket's fan-out per stream row.
  */
object NearDupStream {

  private def md5p = graft.functions.GraftFunctions.Md5PrefixName

  /** Per-row MinHash signature columns (mh0..mh7) for a `(doc_id,
    * text, …)` relation — [[Dedup.minhashSignaturesFor]]'s values as a
    * stateless projection. Documents under 3 tokens carry no shingles
    * and are dropped, exactly like the batch path.
    */
  def withSignature(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val mhCols = (0 until Dedup.MinhashK).map { i =>
      expr(s"array_min(transform(hs, h -> (${Dedup.MinhashA(i)} * h + " +
        s"${Dedup.MinhashB(i)}) % 4294967296))").as(s"mh$i")
    }
    docs
      .withColumn("toks", graft.operators.TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh_arr", expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', " +
          "element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))"))
      // 48-bit base hash per shingle, once — the mh_i mins then run over
      // a long array (same two-step as the batch hashedShingles path)
      .withColumn("hs", expr(s"transform(sh_arr, s -> $md5p(s, 15) DIV 4096)"))
      .select(col("doc_id") +: mhCols: _*)
  }

  /** (doc_id, band, k1, k2) band keys off the per-row signature — the
    * streaming analogue of [[Dedup.lshBandKeys]].
    */
  def bandKeys(sigs: DataFrame): DataFrame = {
    val bandStructs = array((0 until Dedup.MinhashK / 2).map { b =>
      struct(lit(b).as("band"),
        col(s"mh${2 * b}").as("k1"), col(s"mh${2 * b + 1}").as("k2"))
    }: _*)
    sigs
      .select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.k1").as("k1"), col("b.k2").as("k2"))
  }

  /** The static corpus banded and capped ONCE (batch side): ≤
    * [[Dedup.BandCap]] members per bucket, smallest doc_ids kept — the
    * same deterministic truncation as q89's corpus side. Persist/bucket
    * this relation at scale; it is the index the stream probes.
    */
  def corpusBandRelation(corpusDocs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("band"), col("k1"), col("k2"))
      .orderBy(col("doc_id"))
    Dedup.lshBandKeys(corpusDocs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Dedup.BandCap)
      .select(col("doc_id").as("corpus_doc"), col("band"), col("k1"), col("k2"))
  }

  /** The screen itself: band keys of the crawl stream equi-joined
    * against the static corpus band relation — one stateless
    * stream–static join, emitting `(corpus_doc, batch_doc, band)` per
    * shared band, append-only.
    */
  def screenStream(stream: DataFrame, corpusBands: DataFrame): DataFrame =
    bandKeys(withSignature(stream))
      .join(corpusBands, Seq("band", "k1", "k2"))
      .select(col("corpus_doc"), col("doc_id").as("batch_doc"), col("band"))
}
