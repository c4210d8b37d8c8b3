package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocStream, EventsStream, PackStream}

/** Streaming sequence packing must (a) carry the per-shard token offset
  * across micro-batches and (b) agree exactly with the batch packing
  * operator when arrival order matches doc_id order.
  */
class PackStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")

  test("state carries the tape offset across micro-batches; matches batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("pack_stream").toFile
    val landing = new java.io.File(root, "documents.parquet")

    // batch 1: 500 + 20 tokens in s1; 40 in s2
    Seq(
      (1L, 1000L * 1000000, words(500, "w"), "en", "s1"),
      (2L, 1001L * 1000000, words(20, "x"), "en", "s1"),
      (3L, 1002L * 1000000, words(40, "y"), "en", "s2"))
      .toDF("doc_id", "ingest_us", "text", "lang", "source")
      .coalesce(1).write.mode("append").parquet(landing.getPath)
    def partFiles() = landing.listFiles().filter(_.getName.endsWith(".parquet"))
    val firstBatch = partFiles().map(_.getName).toSet
    // batch 2: s1 continues at cum=520 → starts in seq 1 at offset 8
    Seq((4L, 2000L * 1000000, words(600, "z"), "en", "s1"))
      .toDF("doc_id", "ingest_us", "text", "lang", "source")
      .coalesce(1).write.mode("append").parquet(landing.getPath)
    val t0 = System.currentTimeMillis() - 60000
    partFiles().foreach { f =>
      assert(f.setLastModified(if (firstBatch(f.getName)) t0 else t0 + 10000))
    }

    val q = EventsStream.runToMemory(
      PackStream.packStream(DocStream.read(spark, landing.getPath)).toDF(),
      "packed_docs")
    try {
      val got = spark.table("packed_docs")
        .collect()
        .map(r => (r.getLong(1), (r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      assert(got == Map(
        1L -> (0L, 0L, 0L),   // [0, 500)
        2L -> (0L, 1L, 500L), // [500, 520) straddles the 512 cut
        4L -> (1L, 2L, 8L),   // batch 2 resumes s1's tape at 520
        3L -> (0L, 0L, 0L)))  // s2 has its own tape

      // arrival order == doc_id order here, so batch packing must agree
      val batch = graft.operators.CorpusPrep
        .sequencePackingFor(spark.read.parquet(landing.getPath))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      assert(batch == got)
    } finally q.stop()
  }
}
