package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling}
import graft.sources.Tables
import graft.streaming.{DocStream, EventsStream, NearDupStream}

/** The streaming near-dup screen must agree with its batch twin (q89):
  * same signatures, same capped corpus bands, same candidate pairs once
  * the drained per-band hits roll up.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  test("per-row signature equals the batch aggregation signature") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def sigMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (1 until 9).map(r.getLong).toList).toMap
    val perRow = sigMap(NearDupStream.withSignature(docs))
    val batch = sigMap(Dedup.minhashSignaturesFor(docs))
    assert(perRow == batch,
      "the stateless array-form signature must be bit-identical to the " +
        "batch explode+groupBy form")
    assert(perRow.nonEmpty)
  }

  test("streaming screen matches batch incremental LSH pairs on a drained stream") {
    // q89's split: corpus = hash bucket < 0.8, crawl batch = >= 0.9
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sf)
    val b = Sampling.hashBucket("doc_id")
    val corpus = docs.filter(b < 800000L)

    val root = Files.createTempDirectory("neardup_stream").toFile
    val landing = new java.io.File(root, "landing")
    landing.mkdirs()
    // the crawl side lands as two files (split by doc parity),
    // mtime-pinned so the file source's arrival order is deterministic
    val staged = docs.filter(b >= 900000L).select(col("doc_id"),
      (col("doc_id") + 1000000000L).as("ingest_us"),
      col("text"), col("lang"), col("source"))
    staged.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(landing.getPath)
    def partFiles() = landing.listFiles().filter(_.getName.endsWith(".parquet"))
    val firstFile = partFiles().map(_.getName).toSet
    staged.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(landing.getPath)
    val t0 = System.currentTimeMillis() - 60000
    partFiles().foreach { f =>
      assert(f.setLastModified(if (firstFile(f.getName)) t0 else t0 + 10000))
    }

    val q = EventsStream.runToMemory(
      NearDupStream.screenStream(
        DocStream.read(spark, landing.getPath),
        NearDupStream.corpusBandRelation(corpus)),
      "neardup_hits")
    val streamed = spark.table("neardup_hits")
      .groupBy(col("corpus_doc"), col("batch_doc"))
      .agg(count(lit(1)).as("n_bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()

    val batchPairs = Dedup.incrementalLshPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchPairs.nonEmpty, "fixture must produce candidate pairs")
    assert(streamed == batchPairs,
      s"stream=$streamed must equal batch=$batchPairs")
  }
}
