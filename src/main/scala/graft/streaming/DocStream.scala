package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CurationPipeline

/** Streaming document curation — the continuous-ingest twin of the batch
  * [[graft.operators.CurationPipeline]]: a crawler drops document files
  * into a landing directory, and the stream fingerprints, dedupes,
  * quality-gates and split-assigns them incrementally.
  *
  * The stateless stages (features, gate, split) are the SAME code as the
  * batch path (`CurationPipeline.withDocFeatures` / `gateAndSplit`), so
  * the two cannot drift. The only semantic difference is dedup: batch
  * keep-first picks the global min doc_id per fingerprint, while the
  * stream keeps the FIRST ARRIVAL within the watermark horizon —
  * `dropDuplicatesWithinWatermark` keyed on the fingerprint, so dedup
  * state is evicted as the watermark advances instead of growing with
  * corpus size. At 100 TB that bound is the difference between a
  * feasible operator and an unbounded state store; exact cross-horizon
  * dedup belongs to the batch path ([[graft.operators.TextOps
  * .dedupAgainstCorpus]] against the already-curated corpus).
  */
object DocStream {

  /** Landing-file schema: the documents table plus the ingest timestamp
    * (microseconds) the crawler stamps on each row.
    */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ingest_us", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** File-source stream over a landing directory of document parquet
    * files. `maxFilesPerTrigger=1` keeps micro-batches file-sized, so a
    * burst of crawler output cannot produce an oversized batch.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(col("ingest_us")))

  /** [[read]] without the one-file-per-trigger pacing — for
    * run-to-completion drains over an already-staged landing set, where
    * per-file micro-batches are pure harness overhead (the screen is
    * stateless, so batch size cannot change its output).
    */
  def readBulk(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(col("ingest_us")))

  /** The curated append stream: watermarked fingerprint dedup (bounded
    * state, first-arrival-wins) then the shared stateless gate + split.
    */
  def curateStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val featured = CurationPipeline.withDocFeatures(docs)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
    CurationPipeline.gateAndSplit(featured)
  }

  /** [[curateStream]] plus dedup against an ALREADY-CURATED static
    * corpus — the streaming twin of
    * [[graft.operators.TextOps.dedupAgainstCorpus]], via Spark's
    * stream–static anti-join: the corpus collapses to its distinct
    * 16-byte fingerprint set once (batch side, broadcast or bucketed at
    * scale), and each micro-batch anti-joins against it with NO
    * streaming state — re-crawls of corpus content never reach the
    * in-stream dedup window, whose state stays bounded by the watermark
    * as before.
    */
  def curateStreamAgainstCorpus(docs: DataFrame, corpus: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    val corpusFps = corpus
      .select(graft.operators.TextOps.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .distinct()
    val fresh = CurationPipeline.withDocFeatures(docs)
      .join(corpusFps, Seq("fp"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
    CurationPipeline.gateAndSplit(fresh)
  }

  private val drainCounter = new java.util.concurrent.atomic.AtomicLong()

  /** q163: the STREAMING near-dup screen under the hash gate. Stages
    * the crawl split (q89's ≥0.9 hash bucket) as a landing directory,
    * screens it stream–static against the banded-and-capped corpus
    * index ([[NearDupStream]]), and rolls the per-band hits up to
    * `(corpus_doc, batch_doc, n_bands)` — the exact relation the batch
    * q89 computes, so q89's oracle grades the STREAM path too.
    *
    * One caveat is inherent and documented on [[NearDupStream]]: the
    * stream side is uncapped (a cross-micro-batch cap would be
    * unbounded state), so stream ≡ batch exactly while no band bucket
    * overflows [[graft.operators.Dedup.BandCap]] on the crawl side —
    * true at every graded scale (0 truncations at the 100× rehearsal)
    * and asserted by StreamingNearDupSpec.
    */
  def nearDupScreenDrain(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, dir)
    val b = graft.operators.Sampling.hashBucket("doc_id")
    val corpus = docs.filter(b < 800000L)
    // deterministic per-(app, SF) landing path, truncated by overwrite —
    // a fresh temp dir per CALL would leak a corpus-scale copy per call,
    // while the app-id segment keeps concurrent runs (Verify ∥ Bench)
    // from reading each other's mid-overwrite state
    val landing = s"/tmp/graft_q163_landing/" +
      s"${spark.sparkContext.applicationId}/${new java.io.File(dir).getName}"
    docs.filter(b >= 900000L)
      .select(col("doc_id"), (col("doc_id") + 1000000000L).as("ingest_us"),
        col("text"), col("lang"), col("source"))
      .write.mode("overwrite").parquet(landing)
    val name = s"graft_q163_hits_${drainCounter.incrementAndGet()}"
    val q = EventsStream.runToMemory(
      NearDupStream.screenStream(
        readBulk(spark, landing),
        NearDupStream.corpusBandRelation(corpus)),
      name)
    q.stop()
    // checkpoint-and-drop (EventsStream.releaseSink scaladoc): the sink
    // must not stay rooted behind its temp view after the drain
    EventsStream.releaseSink(spark, name)
      .groupBy(col("corpus_doc"), col("batch_doc"))
      .agg(count(lit(1)).as("n_bands"))
  }
}
