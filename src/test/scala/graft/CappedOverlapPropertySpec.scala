package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Randomized equivalence harness for the round-10 capped-overlap
  * rewrite (rank window + merge join, replacing the collect_list
  * bucket): across seeded random interval sets —
  *
  *  - DORMANT cap (cap ≥ any bin population): the pair set equals the
  *    naive theta join exactly, one row per pair;
  *  - BINDING cap: every reported pair is a true overlap, is reported
  *    once, both members rank ≤ cap in the pair's anchor bin, and the
  *    result is bit-stable across re-execution;
  *  - the capped result is a SUBSET of the uncapped truth at any cap.
  *
  * Seeded `scala.util.Random` rather than a property framework: the
  * trials must be byte-reproducible across runs and JVMs for a failure
  * to be debuggable.
  */
class CappedOverlapPropertySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val bin = 10L

  private def randomIntervals(seed: Long, n: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = rnd.nextInt(120).toLong
      val len = rnd.nextInt(40).toLong
      (i.toLong, s, s + len)
    }
  }

  private def capped(iv: Seq[(Long, Long, Long)], cap: Int): Seq[(Long, Long)] = {
    val df = iv.toDF("id", "s", "e")
      .select(struct($"id").as("iid"), $"s", $"e")
    RangeJoin.cappedIntervalOverlapSelf(df, "iid", "s", "e", bin, cap)
      .select($"id_a.id", $"id_b.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  private def naive(iv: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
    (for {
      a <- iv; b <- iv
      if a._1 < b._1 && a._2 <= b._3 && b._2 <= a._3
    } yield (a._1, b._1)).toSeq

  test("dormant cap equals the naive theta join on random interval sets") {
    for (seed <- 1L to 5L) {
      val iv = randomIntervals(seed, 40)
      // cap far above any bin population → every rank filter is identity
      val got = capped(iv, cap = 1000)
      val want = naive(iv)
      assert(got.sorted == want.sorted, s"seed=$seed")
      assert(got.size == got.toSet.size, s"seed=$seed: duplicate pair")
      assert(want.nonEmpty, s"seed=$seed generated a degenerate case")
    }
  }

  test("binding cap: sound subset, per-anchor-rank contract, bit-stable") {
    for (seed <- 11L to 13L) {
      val iv = randomIntervals(seed, 60)
      val cap = 4
      val got = capped(iv, cap)
      val truth = naive(iv).toSet
      // soundness: nothing invented, nothing doubled
      assert(got.toSet.subsetOf(truth), s"seed=$seed: fabricated pair")
      assert(got.size == got.toSet.size, s"seed=$seed: duplicate pair")
      // the binding cap must actually bind on 60 intervals over ~26 bins
      assert(got.size < truth.size, s"seed=$seed: cap never bound")
      // contract: both members rank ≤ cap (by id order) in the anchor bin
      val byId = iv.map(t => t._1 -> t).toMap
      val rankInBin: Map[Long, Seq[Long]] = iv
        .flatMap { case (id, s, e) => (s / bin to e / bin).map(b => b -> id) }
        .groupBy(_._1)
        .map { case (b, xs) => b -> xs.map(_._2).sorted }
      got.foreach { case (ia, ib) =>
        val (_, sa, _) = byId(ia)
        val (_, sb, _) = byId(ib)
        val anchor = math.max(sa, sb) / bin
        val ranked = rankInBin(anchor).take(cap)
        assert(ranked.contains(ia) && ranked.contains(ib),
          s"seed=$seed: pair ($ia,$ib) reported but not both ≤ cap in anchor bin $anchor")
      }
      // and every pair whose anchor-bin members BOTH rank under cap is present
      val expected = naive(iv).filter { case (ia, ib) =>
        val anchor = math.max(byId(ia)._2, byId(ib)._2) / bin
        val ranked = rankInBin(anchor).take(cap)
        ranked.contains(ia) && ranked.contains(ib)
      }
      assert(got.sorted == expected.sorted,
        s"seed=$seed: capped result diverged from the rank contract")
      // determinism: re-execution returns the identical multiset
      assert(capped(iv, cap).sorted == got.sorted, s"seed=$seed: unstable")
    }
  }
}
