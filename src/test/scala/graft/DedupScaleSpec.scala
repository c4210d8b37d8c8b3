package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Skew guards for the dedup family: each candidate generator must stay
  * bounded when one bucket attracts a huge slice of the corpus — the
  * failure mode that turns a 100 TB near-dup pass quadratic. Fixtures
  * here are deliberately degenerate (many identical members of one
  * bucket) so the caps, not the data, bound the pair counts.
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("ngram jaccard: df-cap drops a corpus-frequent shingle's bucket") {
    // 60 clones of one text (single shingle, df=60) + 3 clones of another
    // (df=3) + unrelated filler. With dfCap=50 the 60-clone bucket is
    // dropped (exact dedup's job, not Jaccard's) while the 3-clone
    // cluster still pairs; uncapped, the same input emits C(60,2) pairs.
    val docs = (
      (1 to 60).map(i => (i.toLong, "src0", "aaa bbb ccc")) ++
        (101 to 103).map(i => (i.toLong, "src0", "ddd eee fff")) ++
        Seq((200L, "src0", "one two three four five"))
    ).toDF("doc_id", "source", "text")
    val capped = Dedup.ngramJaccardPairsFor(docs, dfCap = 50).collect()
    assert(capped.length == 3, "only the C(3,2) small-cluster pairs survive")
    assert(capped.forall(_.getLong(2) == 1000000L))
    val uncapped = Dedup.ngramJaccardPairsFor(docs, dfCap = 1000).count()
    assert(uncapped == 60L * 59 / 2 + 3, "uncapped blowup the cap prevents")
  }

  test("lsh: band-bucket cap bounds pairs from an identical-signature pile") {
    // 20 identical docs share every band bucket; cap=8 keeps the 8
    // smallest doc_ids per band, so pairs = C(8,2) with all 4 bands.
    val docs = (
      (1 to 20).map(i => (i.toLong, "src0", "p q r s t u v w")) ++
        Seq((100L, "src0", "completely different text about spark engines"))
    ).toDF("doc_id", "source", "text")
    val pairs = Dedup.lshCandidatePairsFor(docs, bandCap = 8).collect()
    assert(pairs.length == 8 * 7 / 2)
    assert(pairs.forall(_.getLong(2) == 4L), "kept members pair in all bands")
    assert(pairs.forall(r => r.getLong(0) <= 8 && r.getLong(1) <= 8),
      "truncation is deterministic: smallest doc_ids win")
    val uncapped = Dedup.lshCandidatePairsFor(docs, bandCap = 1024).count()
    assert(uncapped == 20L * 19 / 2)
  }

  test("embedding near-dup: IVF bucket cap bounds a degenerate bucket") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // 30 identical vectors in one bucket (a centroid that swallowed a
    // cluster); cap=10 bounds the compare to C(10,2) pairs.
    val assigned = (
      (1 to 30).map(i => (0L, i.toLong, Array(1.0f, 0.0f, 0.0f))) ++
        Seq((1L, 100L, Array(0.0f, 1.0f, 0.0f)),
          (1L, 101L, Array(0.0f, 0.0f, 1.0f)))
    ).toDF("bucket", "vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupBucketedFor(assigned, bucketCap = 10).collect()
    assert(pairs.length == 10 * 9 / 2)
    assert(pairs.forall(_.getLong(2) >= 400000L))
    assert(pairs.forall(r => r.getLong(0) <= 10 && r.getLong(1) <= 10))
    // orthogonal pair in bucket 1 is below the cosine threshold
    assert(!pairs.exists(r => r.getLong(0) == 100L))
  }

  test("q231 crawl novelty: dup batch scores 0, fresh batch scores 1e6") {
    // pick real ids on each side of the md5 split so the fixture uses
    // the production split rule, not a mocked one
    def bucket(id: Long): Long = graft.functions.Md5PrefixLong.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(id.toString), 8) %
      1000000L
    val corpusIds = (1L to 500L).filter(bucket(_) < 800000L).take(2)
    val batchIds = (1L to 500L).filter(bucket(_) >= 900000L).take(2)
    assert(corpusIds.size == 2 && batchIds.size == 2)
    val docs = Seq(
      (corpusIds(0), "src0", "a b c d e"),   // corpus: 3 shingles
      (corpusIds(1), "src0", "k l m"),       // corpus: 1 shingle
      (batchIds(0), "src0", "a b c d e"),    // batch dup: 0 novel
      (batchIds(1), "src0", "x y z w v"))    // batch fresh: 3 novel
      .toDF("doc_id", "source", "text")
    val out = Dedup.crawlNoveltyFor(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == ((2L, 6L, 4L, 3L, 500000L)))
  }
}
