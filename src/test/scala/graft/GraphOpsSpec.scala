package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  /** Scala replay of the exact integer contract in [[GraphOps.pagerank]]
    * — same floor-divs, same order of operations.
    */
  private def brute(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val n = outW.size
    val base = GraphOps.PrScale / n
    val tele = 15L * base / 100L
    var r: Map[Long, Long] = outW.keysIterator.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d, w) <- edges; rs <- r.get(s)) in(d) += rs * w / outW(s)
      r = in.iterator.map { case (d, m) =>
        d -> (tele + GraphOps.PrDampPct * m / 100L)
      }.toMap
    }
    r
  }

  private val handEdges = Seq(
    (1L, 2L, 3L), (2L, 1L, 3L), // A<->B heavy
    (2L, 3L, 1L), (3L, 2L, 1L), // B<->C light
    (1L, 3L, 2L), (3L, 1L, 2L)) // A<->C medium

  test("pagerank replays the integer contract on a hand graph") {
    val got = GraphOps.pagerank(handEdges.toDF("src", "dst", "w"))
      .as[(Long, Long)].collect().toMap
    assert(got === brute(handEdges, GraphOps.PrIters))
  }

  test("pagerank is invariant to input partitioning") {
    val df = handEdges.toDF("src", "dst", "w")
    val a = GraphOps.pagerank(df).as[(Long, Long)].collect().toMap
    val b = GraphOps.pagerank(df.repartition(7)).as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("asymmetric weights produce non-degree-proportional ranks") {
    // B sits on the heavy A<->B edge; its rank must exceed C's, and the
    // ordering must come out of the recursion, not the raw degree alone
    val r = brute(handEdges, GraphOps.PrIters)
    assert(r(2L) > r(3L) && r(1L) > r(3L))
  }

  test("iteration is a contraction: step deltas shrink geometrically") {
    val df = handEdges.toDF("src", "dst", "w")
    def at(i: Int) = GraphOps.pagerank(df, i).as[(Long, Long)].collect().toMap
    val (r1, r2) = (at(1), at(2))
    val (r5, r6) = (at(5), at(6))
    def maxDelta(a: Map[Long, Long], b: Map[Long, Long]) =
      a.keys.map(k => math.abs(a(k) - b(k))).max
    assert(maxDelta(r5, r6) < maxDelta(r1, r2))
  }

  test("shuffled-join plan (node count over the broadcast limit) is byte-identical") {
    val df = handEdges.toDF("src", "dst", "w")
    val viaBroadcast = GraphOps.pagerank(df).as[(Long, Long)].collect().toMap
    // limit 0 forces the merge-join path every graph >50M nodes takes
    val viaShuffle = GraphOps.pagerank(df, broadcastNodeLimit = Some(0L))
      .as[(Long, Long)].collect().toMap
    assert(viaShuffle === viaBroadcast)
    assert(viaShuffle === brute(handEdges, GraphOps.PrIters))
  }

  test("shuffled plan on the trade graph matches the broadcast plan") {
    val edges = GraphOps.tradeEdges(spark, sf)
    val a = GraphOps.pagerank(edges).as[(Long, Long)].collect().toMap
    val b = GraphOps.pagerank(edges, broadcastNodeLimit = Some(0L))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("reliable checkpointDir mode materializes identical ranks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_chk").toString
    val df = handEdges.toDF("src", "dst", "w")
    val got = GraphOps.pagerank(df, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(got === brute(handEdges, GraphOps.PrIters))
    // the reliable checkpoint actually wrote blocks to the given dir
    def nonEmpty(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles).exists(_.exists(nonEmpty))
    assert(nonEmpty(new java.io.File(dir)), s"no checkpoint data under $dir")
  }

  test("trade pagerank conserves walk mass and covers both node types") {
    val out = GraphOps.tradePagerank(spark, sf)
      .select(col("node_type"), col("rank_q")).as[(String, Long)].collect()
    assert(out.nonEmpty && out.forall(_._2 > 0L))
    assert(out.map(_._1).toSet === Set("supplier", "customer"))
    // total mass stays within the teleport/damping envelope of PrScale:
    // floor-divs only ever LOSE quanta, the teleport term adds ≤ 15%
    val mass = out.map(_._2).sum
    assert(mass > (GraphOps.PrScale * 8L) / 10L && mass < (GraphOps.PrScale * 115L) / 100L,
      s"total mass $mass out of envelope")
  }

  /** A lineitem-shaped fixture: each listed order carries the given
    * suppliers, replicated `w` times so the co-occurrence weight (and
    * hence the p95 cut) is controlled exactly.
    */
  private def liFixture(orders: Seq[(Long, Seq[Long], Int)]) = {
    val rows = for {
      (ok, supps, w) <- orders
      k <- 1 to w
      s <- supps
    } yield (ok * 1000L + k, s) // distinct order per replica
    rows.toDF("l_orderkey", "l_suppkey")
  }

  test("triangles: a known sparse graph with one closed motif") {
    // 80 weight-1 filler pairs pin the p95 cut at 1 (80·20 ≥ 84·19),
    // so only weight-2 pairs survive: edges {1-2, 1-3, 2-3, 3-4} →
    // one triangle (1,2,3); node 4 has degree 1, fillers drop out
    val filler = (0 until 80).map { k =>
      (100L + k, Seq(50L + 2 * k, 51L + 2 * k), 1)
    }
    val strong = Seq(
      (1L, Seq(1L, 2L), 2), (2L, Seq(1L, 3L), 2),
      (3L, Seq(2L, 3L), 2), (4L, Seq(3L, 4L), 2))
    val out = GraphOps.supplierTrianglesFor(liFixture(strong ++ filler))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(1L) == ((2L, 1L, 1000000L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((3L, 1L, 333333L))) // 2·1·1e6 / (3·2)
    assert(out(4L) == ((1L, 0L, 0L)))
    // filler nodes fall below the cut and never reach the output
    assert(!out.keySet.exists(_ >= 50L))
  }

  test("k-core peel: pendant drops round 1, K4 core reaches fixpoint") {
    // K4 on {1,2,3,4} plus pendant edge 4−5: node 5 (deg 1) peels in
    // round 1; the K4 survivors all keep degree 3 — fixpoint rows
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("a", "b")
    val out = GraphOps.kCoreTrajectoryFor(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out.head == ((1L, 4L, 6L)))
    assert(out.tail.forall { case (_, n, e) => n == 4L && e == 6L })
    assert(out.map(_._1) == (1L to 6L))
  }

  test("k-core peel: a tree peels to nothing and stays empty") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = GraphOps.kCoreTrajectoryFor(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // no node ever has degree >= 3
    assert(out == (1L to 6L).map(r => (r, 0L, 0L)).toSet)
  }

  test("triangles: complete K4 above the cut counts 4 motifs") {
    val supps = Seq(1L, 2L, 3L, 4L)
    val strong = for {
      i <- supps.indices; j <- supps.indices if i < j
    } yield ((i * 10 + j).toLong, Seq(supps(i), supps(j)), 2)
    val filler = (0 until 114).map { k =>
      (1000L + k, Seq(50L + 2 * k, 51L + 2 * k), 1)
    }
    val out = GraphOps.supplierTrianglesFor(liFixture(strong ++ filler))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // K4: every node degree 3, in C(3,2)=3 triangles, clustering 1
    supps.foreach { s =>
      assert(out(s) == ((3L, 3L, 1000000L)), s"node $s: ${out(s)}")
    }
  }

  // two triangles {1,2,3} and {4,5,6} bridged by 3-4: LPA must settle
  // on exactly two communities (components would find one)
  private val twoTriangles = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L),
    (3L, 4L)).toDF("a", "b")

  test("q189 LPA separates bridged triangles into two communities") {
    val out = GraphOps.labelPropagationFor(twoTriangles)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // hand-traced sync rounds: stable at round 3; round 4 confirms
    val last = out.last
    assert(last._1 == 4L && last._2 == 2L && last._3 == 0L)
    // membership witness: {1,2,3}→1, {4,5,6}→3
    val expectChecksum = Seq(
      1L * 1000000000L + 1L, 2L * 1000000000L + 1L, 3L * 1000000000L + 1L,
      4L * 1000000000L + 3L, 5L * 1000000000L + 3L, 6L * 1000000000L + 3L)
      .reduce(_ ^ _)
    assert(last._4 == expectChecksum)
  }

  test("q189 LPA trajectory is invariant to input partitioning") {
    val a = GraphOps.labelPropagationFor(twoTriangles).collect().toSeq
    val b = GraphOps.labelPropagationFor(twoTriangles.repartition(5))
      .collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("q194 modularity panel: hand values on the bridged triangles") {
    val out = GraphOps.communityModularityFor(twoTriangles)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // two communities of 3 nodes, 3 internal edges, degree mass 7 each
    // (bridge 3-4 crosses): q_cell = 3e6/7 − 49e6/(4·49) = 178571
    assert(out == Set((1L, 3L, 3L, 7L, 178571L), (3L, 3L, 3L, 7L, 178571L)))
  }

  test("q194 modularity is near zero when LPA collapses to one community") {
    // a triangle alone: every node adopts label 1 → e_in = m, d = 2m,
    // q_cell = 1e6 − 1e6 = 0
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val out = GraphOps.communityModularityFor(tri).collect()
    assert(out.length == 1 && out.head.getLong(4) == 0L)
  }

  test("q207 BFS walks a path one hop per round") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("a", "b")
    val out = GraphOps.bfsReachFor(path, seeds = 1)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    // seed {1}; each round reaches exactly the next path node
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      (0L to 4L).map(h => (h, 1L, h + 1L)))
    assert(out.map(_._4).toSeq == (1L to 5L).map(Some(_)))
  }

  test("q207 BFS saturates on a star and never crosses components") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)).toDF("a", "b")
    val out = GraphOps.bfsReachFor(g, seeds = 1)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(out(0) == ((0L, 1L, 1L, Some(1L))))
    assert(out(1) == ((1L, 3L, 4L, Some(2L ^ 3L ^ 4L))))
    // saturated: empty frontiers, reach pinned at the component size
    assert(out.drop(2).forall(t => t._2 == 0L && t._3 == 4L && t._4.isEmpty))
  }

  test("q207 BFS trajectory is invariant to input partitioning") {
    val a = GraphOps.bfsReachFor(twoTriangles).collect().toSeq
    val b = GraphOps.bfsReachFor(twoTriangles.repartition(5)).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("q189 LPA honors a reliable checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("lpa_ckpt").toString
    val a = GraphOps.labelPropagationFor(twoTriangles,
      checkpointDir = Some(dir)).collect().toSeq
    val b = GraphOps.labelPropagationFor(twoTriangles).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
    assert(new java.io.File(dir).listFiles.nonEmpty)
  }

  test("q224 link prediction: hand-computed 4-cycle predictions") {
    // C4: 1-3, 1-4, 2-3, 2-4. Non-edges (1,2) and (3,4) each share
    // both middles; every degree is 2 → jaccard = 2e6/(2+2-2) = 1e6.
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val out = GraphOps.linkPredictionFor(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == Set((1L, 2L, 2L, 2L, 2L, 1000000L),
      (3L, 4L, 2L, 2L, 2L, 1000000L)))
  }

  test("q224 link prediction: hub wedges stop at the neighbor cap") {
    // two hubs (100, 101) each adjacent to leaves 1..40: leaf pairs
    // inside the 32-smallest cap get both middles; pairs past the cap
    // never become candidates; the hub pair keeps its TRUE degree in
    // the Jaccard denominator while the numerator is wedge-counted
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, 100L), (i, 101L))).toDF("a", "b")
    val out = GraphOps.linkPredictionFor(edges).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out((1L, 2L)) == ((2L, 2L, 2L, 1000000L)))
    assert(!out.contains((33L, 34L)))
    assert(out((100L, 101L)) == ((40L, 40L, 40L, 1000000L)))
  }

  test("q176 triangles: over-limit merge plan is byte-identical to the broadcast plan") {
    // the q154 dual-plan law, extended family-wide: limit 0 forces the
    // merge-join path every >50M-node graph takes; same motif counts
    val li = liFixture(Seq(
      (1L, Seq(1L, 2L), 2), (2L, Seq(1L, 3L), 2),
      (3L, Seq(2L, 3L), 2), (4L, Seq(3L, 4L), 2)) ++
      (0 until 80).map(k => (100L + k, Seq(50L + 2 * k, 51L + 2 * k), 1)))
    def rows(lim: Option[Long]) =
      GraphOps.supplierTrianglesFor(li, broadcastNodeLimit = lim)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    assert(rows(Some(0L)) === rows(None))
  }

  test("q224 link prediction: over-limit merge plan is byte-identical to the broadcast plan") {
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, 100L), (i, 101L))).toDF("a", "b")
    def rows(lim: Option[Long]) =
      GraphOps.linkPredictionFor(edges, broadcastNodeLimit = lim)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(rows(Some(0L)) === rows(None))
  }
}
