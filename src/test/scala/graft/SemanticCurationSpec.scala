package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPrep, Dedup, Sampling, Similarity, TextOps}

/** Hand-computed semantics for the round-11 curation additions: the
  * conditional char-bigram LM (q170), the per-source adaptive quality
  * floor (q171), the SemDeDup ledger (q172), and the JL sign
  * projection (q173). The oracle gate covers the full-table runs;
  * these pin the arithmetic and the keep rules on fixtures.
  */
class SemanticCurationSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** First doc ids on either side of the 80% train split. */
  private lazy val (trainId, heldId) = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val buckets = (1L to 64L).toDF("doc_id")
      .select(col("doc_id"), Sampling.hashBucket("doc_id").as("hb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    (buckets.find(_._2 < 800000L).get._1,
      buckets.find(_._2 >= 800000L).get._1)
  }

  test("char-bigram LM: transition surprisal on a crafted corpus") {
    // train doc "abab" → bigrams ab×2, ba×1; prefixes a→2, b→1, so
    // every trained transition is certainty (cond_ppm = 1e6).
    // held-out "abacxy": ab→0, ba→0 surprisal; ac unseen under a seen
    // prefix (a: n_pre=2, n_bg=0 → cond 0 → 1e6); cx and xy have
    // UNSEEN prefixes → 1e6 each. avg = 3e6 DIV 5 = 600000.
    val docs = Seq((trainId, "abab"), (heldId, "abacxy"))
      .toDF("doc_id", "text")
    val out = TextOps.charBigramNllFor(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(trainId) == ((3L, 0L)))
    assert(out(heldId) == ((5L, 600000L)))
  }

  test("adaptive quality floor: exact per-source p25 and value-rule keeps") {
    val docs = Seq(
      (1L, "x y", "A"),          // 0 ppm, 2 tok
      (2L, "the x y z", "A"),    // 250000, 4 tok
      (3L, "the x", "A"),        // 500000, 2 tok
      (4L, "the the x y", "A"),  // 500000, 4 tok
      (5L, "the the", "A"),      // 1000000, 2 tok
      (6L, "the", "B"))          // 1000000, 1 tok
      .toDF("doc_id", "text", "source")
    val out = CorpusPrep.adaptiveQualityFloorFor(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // A: n=5 → floor rank 1+(5−1) DIV 4 = 2 → thr 250000; keeps 4 of 5
    assert(out == Set(
      ("A", 5L, 250000L, 4L, 12L, 14L),
      ("B", 1L, 1000000L, 1L, 1L, 1L)))
  }

  test("adaptive floor ignores empty and whitespace-only documents") {
    // split('') = [''] — without the emptiness guard these would score
    // as perfect 1-token docs and drag A's floor to 0
    val docs = Seq(
      (1L, "", "A"), (2L, "   ", "A"),
      (3L, "the x", "A"), (4L, "x y", "A"))
      .toDF("doc_id", "text", "source")
    val out = CorpusPrep.adaptiveQualityFloorFor(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // only docs 3 and 4 count: n=2 → floor rank 1 → thr 0 (doc 4)
    assert(out == Set(("A", 2L, 0L, 2L)))
  }

  test("semantic-dedup ledger replays the pair relation per bucket") {
    val ledger = Dedup.semanticDedupLedger(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val assigned = Similarity.assignedEmbeddings(spark, sf)
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("vec_id").as("ids"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent re-derivation: dropped ids per bucket from the pair
    // generator joined back to the assignment
    val droppedByBucket = Dedup.embeddingNearDupBucketed(spark, sf)
      .select(col("id_b").as("vec_id")).distinct()
      .join(Similarity.assignedEmbeddings(spark, sf), Seq("vec_id"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), sum("vec_id").as("ids"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ledger.keySet == assigned.keySet)
    ledger.foreach { case (b, (nVecs, nDropped, nKept, keptSum)) =>
      val (nAll, idsAll) = assigned(b)
      val (nDrop, idsDrop) = droppedByBucket.getOrElse(b, (0L, 0L))
      assert(nVecs == nAll, s"bucket $b members")
      assert(nDropped == nDrop, s"bucket $b dropped")
      assert(nKept == nAll - nDrop, s"bucket $b kept")
      assert(keptSum == idsAll - idsDrop, s"bucket $b kept-id checksum")
    }
    assert(ledger.values.map(_._2).sum > 0L, "fixture has near-dups")
  }

  test("JL projection matches a driver-side replay on real vectors") {
    val rows = Similarity.jlProjectionChecksumsFor(
      graft.sources.Tables.embeddings(spark, sf).filter(col("vec_id") < 3))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 3)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    raw.foreach { case (id, emb) =>
      val xq = emb.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      val ys = (0 until Similarity.JlOutDim).map { j =>
        (1 to Similarity.JlInDim)
          .map(i => Similarity.jlSign(j, i) * xq(i - 1)).sum
      }
      val expected = (ys.sum, ys.reduce(_ ^ _), ys.map(y => y * y).sum)
      assert(rows(id) == expected, s"vec $id")
    }
  }

  test("BPE merges: greedy-leftmost overlap, weighted counts, fused rounds") {
    // corpus: "aaab" ×2, "ab" ×1 → round 1 pairs: (a,a) 2 per "aaab"
    //   (overlap counted) ×2 = 4; (a,b) 2+1 = 3 → merge (a,a), count 4.
    //   Greedy-leftmost on "aaab": [aa, a, b] (NOT [a, aa, b]) →
    //   symbols after = 2·3 + 1·2 = 8.
    // round 2 over [aa,a,b]×2 + [a,b]: pairs (aa,a) 2, (a,b) 3 →
    //   merge (a,b), count 3 → "aaab"→[aa, ab], "ab"→[ab] → after = 5.
    // round 3: pairs (aa,ab) 2 → merge, count 2 → after = 3.
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val out = CorpusPrep.bpeTrainMergesFor(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "a", "a", 4L, 8L),
      (2L, "a", "b", 3L, 5L),
      (3L, "aa", "ab", 2L, 3L)))
  }

  test("BPE count ties break on the lexicographically smallest pair") {
    // "cd" and "ab" both appear twice; (a,b) < (c,d)
    val docs = Seq((1L, "cd cd ab ab")).toDF("doc_id", "text")
    val first = CorpusPrep.bpeTrainMergesFor(docs, steps = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(first.toSeq == Seq(("a", "b", 2L)))
  }

  test("BPE even runs fuse completely: aaaa -> [aa, aa]") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = CorpusPrep.bpeTrainMergesFor(docs, steps = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    // round 1: (a,a) count 3 (overlaps), fuse → [aa, aa], after = 2
    // round 2: (aa,aa) count 1, fuse → [aaaa], after = 1
    assert(out == Seq(
      (1L, "a", "a", 3L, 2L),
      (2L, "aa", "aa", 1L, 1L)))
  }

  test("knn label eval: every bucketed vector with a neighbor votes once") {
    val out = Similarity.knnLabelEval(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // total votes = vectors whose capped bucket has >= 2 members
    val sizes = Similarity.assignedEmbeddings(spark, sf)
      .groupBy("bucket").count().collect()
      .map(r => math.min(r.getLong(1), graft.operators.Dedup.EmbBucketCap))
    val expectedVotes = sizes.filter(_ >= 2).sum
    assert(out.values.sum == expectedVotes)
    // labels land in the data's label domain
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    out.keys.foreach { case (t, p) =>
      assert(labels.contains(t) && labels.contains(p))
    }
    // deterministic across invocations
    val again = Similarity.knnLabelEval(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out == again)
    // the derived-width twin obeys the same one-vote identity against
    // ITS assignment (wider index → different buckets, same algebra)
    val dOut = Similarity.knnLabelEvalDerived(spark, sf)
      .collect().map(_.getLong(2)).sum
    val dSizes = Similarity.assignedEmbeddingsAuto(spark, sf)
      .groupBy("bucket").count().collect()
      .map(r => math.min(r.getLong(1), graft.operators.Dedup.EmbBucketCap))
    assert(dOut == dSizes.filter(_ >= 2).sum)
  }

  test("covariance sums match a driver-side replay; ledger rows complete") {
    val out = Similarity.embeddingCovarianceSums(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d = Similarity.JlInDim
    assert(out.size == d * (d + 1) / 2 + d + 1)
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .collect().map(_.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1000.0).toLong))
    assert(out((0L, 0L)) == vecs.length.toLong)
    // spot-check the (1,1), (1,2) Gram cells and the dim-1 sum
    assert(out((1L, 1L)) == vecs.map(v => v(0) * v(0)).sum)
    assert(out((1L, 2L)) == vecs.map(v => v(0) * v(1)).sum)
    assert(out((1L, 0L)) == vecs.map(_(0)).sum)
    assert(out((d.toLong, d.toLong)) == vecs.map(v => v(d - 1) * v(d - 1)).sum)
  }

  test("BPE encode applies the learned merges per document") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "ab aaab")).toDF("doc_id", "text")
    // merges (a,a), (a,b), (aa,ab): "aaab" → 1 token, "ab" → 1 token
    val at3 = CorpusPrep.bpeEncodeCountsFor(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(at3 == Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
    // at 2 merges "aaab" is still [aa, ab]
    val at2 = CorpusPrep.bpeEncodeCountsFor(docs, steps = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(at2 == Map(1L -> ((3L, 5L)), 2L -> ((2L, 3L))))
  }

  /** Direct Sennrich-style reference: greedy-leftmost merge of the top
    * (cnt DESC, pair ASC) pair over a word-count map, overlap counted.
    */
  private def bruteBpe(words: Map[String, Long], steps: Int)
      : Seq[(String, String, Long, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.toSeq.map { case (w, c) => w.toVector.map(_.toString) -> c }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    (1 to steps).map { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val (a, b) = counts.keys.toSeq
        .sortBy { case (x, y) => (-counts((x, y)), x, y) }.head
      val cnt = counts((a, b))
      segs = segs.toSeq.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result() -> c
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      val after = segs.map { case (syms, c) => syms.length * c }.sum
      (a, b, cnt, after)
    }
  }

  test("BPE merges equal the direct greedy reference on random corpora") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      // small alphabet forces heavy overlap runs — the hard case for
      // the run-alternation algebra
      val words = (1 to 12).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString
      }
      val text = words.mkString(" ")
      val wc = words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val expected = bruteBpe(wc, 3).zipWithIndex
        .map { case ((a, b, c, n), i) => (i + 1L, a, b, c, n) }
      val got = CorpusPrep.bpeTrainMergesFor(
        Seq((1L, text)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      assert(got == expected, s"trial $trial corpus '$text'")
    }
  }

  test("JL sign matrix is deterministic and roughly balanced") {
    val flat = for {
      j <- 0 until Similarity.JlOutDim
      i <- 1 to Similarity.JlInDim
    } yield Similarity.jlSign(j, i)
    val plus = flat.count(_ == 1)
    assert(flat.forall(s => s == 1 || s == -1))
    // 1024 Bernoulli(1/2) draws: |plus − 512| < 160 is > 20σ slack
    assert(math.abs(plus - 512) < 160, s"plus=$plus")
    // stability: recompute the whole matrix and compare
    val again = for {
      j <- 0 until Similarity.JlOutDim
      i <- 1 to Similarity.JlInDim
    } yield Similarity.jlSign(j, i)
    assert(flat == again)
  }
}
