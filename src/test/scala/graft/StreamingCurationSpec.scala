package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CurationPipeline
import graft.streaming.{DocStream, EventsStream}

/** The streaming curation path must agree with the batch path on the
  * same landing data: same survivors, same split assignment. The only
  * allowed divergence is dedup policy (batch = global min doc_id,
  * stream = first arrival within the watermark), so the fixture makes
  * the keeper both smaller-id and earlier-arriving.
  */
class StreamingCurationSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private val good1 =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"
  private val good2 =
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
  private val good3 =
    "whiskey xray yankee zulu apple banana cherry damson elder fig grape"

  test("streaming curation matches batch curation on the same landing dir") {
    import spark.implicits._
    val root = Files.createTempDirectory("doc_stream").toFile
    val landing = new java.io.File(root, "documents.parquet")

    // file 1 (earlier mtime): two good docs + one too-short (gate drop)
    Seq(
      (1L, 1000L * 1000000, good1, "en", "src0"),
      (2L, 1001L * 1000000, good2, "en", "src0"),
      (3L, 1002L * 1000000, "too short", "en", "src0"))
      .toDF("doc_id", "ingest_us", "text", "lang", "source")
      .coalesce(1).write.mode("append").parquet(landing.getPath)
    def partFiles() = landing.listFiles().filter(_.getName.endsWith(".parquet"))
    val firstBatch = partFiles().map(_.getName).toSet
    // file 2 (later): a re-crawl dup of doc 1 (same fp modulo
    // normalization) + one new good doc
    Seq(
      (10L, 2000L * 1000000, good1.toUpperCase + "  ", "en", "src0"),
      (4L, 2001L * 1000000, good3, "th", "src1"))
      .toDF("doc_id", "ingest_us", "text", "lang", "source")
      .coalesce(1).write.mode("append").parquet(landing.getPath)
    // pin mtimes explicitly (not Thread.sleep): coarse-granularity
    // filesystems could otherwise give both files the same timestamp and
    // flip the file source's arrival order
    val t0 = System.currentTimeMillis() - 60000
    partFiles().foreach { f =>
      assert(f.setLastModified(
        if (firstBatch(f.getName)) t0 else t0 + 10000))
    }

    val batch = CurationPipeline.curate(spark, root.getPath)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet

    val q = EventsStream.runToMemory(
      DocStream.curateStream(DocStream.read(spark, landing.getPath)),
      "doc_curated")
    val streamed = spark.table("doc_curated")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    q.stop()

    assert(batch == streamed,
      s"batch=$batch stream=$streamed must agree")
    assert(streamed.map(_._1) == Set(1L, 2L, 4L),
      "dup 10 deduped against 1, short 3 gated out")
  }

  test("stream-static anti-join drops re-crawls of the curated corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory("doc_stream_corpus").toFile
    val landing = new java.io.File(root, "landing")
    landing.mkdirs()
    // static corpus already contains good1 (different id / case / spacing
    // — fingerprint-normalized dup)
    val corpus = Seq((100L, good1.toUpperCase + " ", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // arriving batch: a corpus re-crawl (drop), a fresh doc (keep), and
    // an in-stream dup pair (first arrival wins)
    Seq(
      (1L, 1000L * 1000000, good1, "en", "src0"),
      (2L, 1001L * 1000000, good2, "en", "src0"),
      (3L, 1002L * 1000000, good2 + " ", "en", "src0"))
      .toDF("doc_id", "ingest_us", "text", "lang", "source")
      .coalesce(1).write.mode("append").parquet(landing.getPath)

    val q = EventsStream.runToMemory(
      DocStream.curateStreamAgainstCorpus(
        DocStream.read(spark, landing.getPath), corpus),
      "doc_curated_corpus")
    try {
      val survivors = spark.table("doc_curated_corpus")
        .collect().map(_.getLong(0)).toSet
      assert(survivors == Set(2L),
        "corpus re-crawl 1 dropped, in-stream dup 3 dropped, 2 kept")
    } finally q.stop()
  }
}
