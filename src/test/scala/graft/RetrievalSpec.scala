package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  // 200 docs so the every-100th query rule yields queries 0 and 100.
  // The "alpha beta gamma" shingle sits in every doc (df 100% —
  // admission must drop it); the marker/tail shingles have df ≤ 4
  // (all admitted at the floor of 5).
  private def handTexts: Map[Long, String] =
    (0L until 200L).map { i =>
      i -> s"alpha beta gamma marker${i % 50} tail${i % 3}"
    }.toMap

  test("lexical scoring replays the integer shingle-idf contract") {
    val docs = handTexts.toSeq.map { case (i, t) => (i, t, "en", "web", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Retrieval.lexicalTopKFor(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (q, r, d, s) => (q, r) -> (d, s) }.toMap
    assert(got.nonEmpty)
    // Scala brute force with identical arithmetic, over STRING shingles
    // (the 60-bit hash is injective on this corpus)
    val shingles = handTexts.map { case (i, t) =>
      val ts = t.trim.split("\\s+").toSeq
      i -> ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val n = shingles.size
    val df = shingles.values.flatten.groupBy(identity)
      .map { case (s, xs) => s -> xs.size.toLong }
    val cap = math.max(Retrieval.LexDfFloor, n / 100L)
    val idf = df.collect { case (s, f) if f <= cap => s -> (n * 1000000L / f) }
    for (q <- Seq(0L, 100L)) {
      val scores = (0L until 200L).filter(_ != q).flatMap { d =>
        val s = (shingles(q) & shingles(d)).toSeq.flatMap(idf.get).sum
        if (s > 0) Some(d -> s) else None
      }
      val expect = scores.sortBy { case (d, s) => (-s, d) }.take(Retrieval.LexK)
      assert(expect.nonEmpty, s"query $q must have candidates")
      expect.zipWithIndex.foreach { case ((d, s), i) =>
        assert(got((q, i + 1L)) === ((d, s)), s"query $q rank ${i + 1}")
      }
    }
  }

  test("rrf fusion recombines exactly the two component rankings") {
    val lex = Retrieval.lexicalTopK(spark, sf)
      .select($"q_id", $"doc_id", $"rank").as[(Long, Long, Long)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    val sem = graft.operators.Similarity.ivfKnnAuto(spark, sf)
      .select($"q_id", $"neighbor_id", $"rank".cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (q, d, r) => (q, d) -> r }.toMap
    val fused = Retrieval.rrfFusion(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(fused.nonEmpty)
    fused.foreach { case (q, d, lexRank, semRank, rrf, fusedRank) =>
      assert(lexRank === lex.getOrElse((q, d), -1L), s"($q,$d) lex")
      assert(semRank === sem.getOrElse((q, d), -1L), s"($q,$d) sem")
      val expect =
        (if (lexRank > 0) 1000000L / (Retrieval.RrfK0 + lexRank) else 0L) +
        (if (semRank > 0) 1000000L / (Retrieval.RrfK0 + semRank) else 0L)
      assert(rrf === expect, s"($q,$d) rrf")
      assert(fusedRank >= 1L && fusedRank <= Retrieval.LexK)
    }
    // per query: the fused list is the top-LexK of the union by
    // (rrf DESC, doc_id ASC)
    val byQ = fused.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy { case (_, d, _, _, rrf, _) => (-rrf, d) }
      sorted.zipWithIndex.foreach { case ((_, _, _, _, _, fr), i) =>
        assert(fr === i + 1L, s"query $q fused order") }
    }
  }

  test("q225 retrieval metrics: hand-computed AP/RR/P@5 panel") {
    // labels: 1,2,3,6 → A (n=4); 4,5 → B (n=2)
    val lab = Seq((1L, 10L), (2L, 10L), (3L, 10L), (6L, 10L),
      (4L, 20L), (5L, 20L)).toDF("vec_id", "label")
    // query 1 (A): hits at ranks 2,4,5 → sum_prec = 1e6/2 + 2e6/4 +
    // 3e6/5 = 1.6e6; R = 3 → AP 533333; RR 500000; P@5 600000
    // query 4 (B): five A-misses → all zeros, denom clamps at R=1
    val res = Seq(
      (1L, 4L, 1), (1L, 2L, 2), (1L, 5L, 3), (1L, 3L, 4), (1L, 6L, 5),
      (4L, 2L, 1), (4L, 3L, 2), (4L, 6L, 3), (4L, 1L, 4), (4L, 2L, 5))
      .toDF("q_id", "neighbor_id", "rank")
    val out = graft.operators.Similarity.retrievalMetricsFor(res, lab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((2L, 266666L, 250000L, 300000L, 500000L)))
  }
}
