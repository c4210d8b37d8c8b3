package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Hash-min connected components: label propagation over candidate-pair
  * graphs of the shapes dedup actually produces (stars, chains, multiple
  * clusters), including multi-hop convergence.
  */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def cc(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint clusters keep separate min labels") {
    assert(cc((1L, 2L), (2L, 3L), (10L, 11L)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("chain graph needs multi-hop propagation to reach the far end") {
    // 9-8, 8-7, ..., 2-1: label 1 must travel 8 hops
    val chain = (1L to 8L).map(i => (i, i + 1))
    val got = cc(chain: _*)
    assert(got == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("iteration budget exhaustion returns best-effort labels, not a crash") {
    // 9-hop chain with maxIter=2: label 1 cannot reach the far end, but
    // the job must still return a valid (finer) clustering instead of
    // throwing away the rounds already paid for.
    val chain = (1L to 9L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"), maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == (1L to 10L).toSet)
    // labels only ever decrease toward the true component min, and every
    // label is a member of the graph
    got.foreach { case (doc, label) => assert(label <= doc && got.contains(label)) }
    // near end converged, far end not yet: that's the documented tradeoff
    assert(got(2L) == 1L)
    assert(got(10L) > 1L)
  }

  test("reliable checkpointing yields the same labels as localCheckpoint") {
    val dir = java.nio.file.Files.createTempDirectory("cc-chk").toString
    val chain = (1L to 8L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"),
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 9L).map(_ -> 1L).toMap)
    // reliable checkpoint actually wrote blocks to the dir
    assert(new java.io.File(dir).listFiles.nonEmpty)
  }

  private def ccStars(pairs: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponentsStars(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("large-star/small-star matches hash-min on dedup-shaped graphs") {
    val shapes = Seq(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)),             // disjoint clusters
      Seq((5L, 6L), (5L, 7L), (5L, 8L), (1L, 5L)),     // star, hub not min
      (1L to 8L).map(i => (i, i + 1)),                 // chain
      Seq((7L, 3L), (3L, 9L), (9L, 2L), (4L, 8L), (8L, 4L))) // dup edges
    shapes.foreach { pairs =>
      assert(ccStars(pairs: _*) == cc(pairs: _*), s"disagree on $pairs")
    }
  }

  test("1k-vertex chain: stars converge in O(log n) rounds, hash-min cannot") {
    val chain = (1L to 999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsStarsWithStats(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 1000L).map(_ -> 1L).toMap,
      "every vertex must collapse to component 1")
    assert(rounds <= 16, s"expected O(log n) ~ 10 rounds, used $rounds")
    // hash-min propagates the label one hop per round: at the same
    // round budget the far end of the chain provably hasn't converged
    val hm = Dedup.connectedComponents(chain, maxIter = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hm(1000L) > 1L, "hash-min needs O(n) rounds on a chain")
  }

  test("star with the canonical doc NOT the hub") {
    // hub 5 connects 6,7,8 and also 1: whole star collapses to 1
    assert(cc((5L, 6L), (5L, 7L), (5L, 8L), (1L, 5L)) ==
      Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 1L))
  }

  test("minhash accuracy: identical docs estimate exactly 1.0") {
    import spark.implicits._
    val text = (0 until 50).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text, "s"), (2L, text, "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.minhashAccuracyFor(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 1000000L, 1000000L)))
  }

  test("minhash accuracy: K=8 estimate tracks exact Jaccard on real pairs") {
    val rows = Dedup.minhashAccuracy(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact) =>
      assert(est % 125000 == 0 && est >= 0 && est <= 1000000)
      // K=8 ⇒ σ ≈ √(J(1−J)/8) ≤ 0.177; allow 3σ plus the lattice step
      assert(math.abs(est - exact) <= 3 * 177000 + 125000,
        s"est $est vs exact $exact implausibly far")
    }
  }

  test("component ids are the keep-first survivors of the LSH clusters") {
    val comps = Dedup.dedupComponents(spark, "/root/testdata/sf0.001")
    val byComp = comps.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2)
    // every component's label is its own minimum member
    byComp.foreach { case (label, members) =>
      assert(members.map(_._1).min == label)
    }
    // and members exactly cover the docs that appear in candidate pairs
    val pairDocs = Dedup.lshCandidatePairs(spark, "/root/testdata/sf0.001")
      .select("doc_a").union(
        Dedup.lshCandidatePairs(spark, "/root/testdata/sf0.001").select("doc_b"))
      .as[Long].collect().toSet
    assert(comps.select("doc_id").as[Long].collect().toSet == pairDocs)
  }
}
