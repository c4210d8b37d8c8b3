package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RangeJoin, Sampling}

class RangeSamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("binned range join equals the naive theta join") {
    val points = (0L until 2000L by 7L).toDF("ts")
    val intervals = Seq(
      (0L, 100L, "a"), (50L, 60L, "b"), (500L, 1500L, "c"),
      (1999L, 1999L, "d"), (1200L, 1201L, "e"))
      .toDF("start", "end", "name")
    val binned = RangeJoin.binnedPointInInterval(
        points, "ts", intervals, "start", "end", binSize = 128L)
      .select("ts", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(intervals,
        points("ts") >= intervals("start") && points("ts") <= intervals("end"))
      .select("ts", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("binned interval overlap equals the naive theta join, one row per pair") {
    // edge shapes: touching ends (inclusive), containment, identical
    // intervals, negative domain, disjoint
    val a = Seq((1L, 0L, 100L), (2L, 200L, 210L), (3L, -50L, -10L),
      (4L, 500L, 500L), (5L, 90L, 260L)).toDF("aid", "sa", "ea")
    val b = Seq((11L, 100L, 150L), (12L, 205L, 205L), (13L, -20L, 5L),
      (14L, 501L, 600L), (15L, 0L, 1000L)).toDF("bid", "sb", "eb")
    val binned = RangeJoin.binnedIntervalOverlap(a, "sa", "ea", b, "sb", "eb", 64L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = a.join(b, $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(binned.sorted == naive.sorted, "same pairs, no duplicates from shared bins")
    assert(binned.size == binned.toSet.size)
    assert(naive.nonEmpty)
  }

  test("capped interval overlap: dormant cap equals uncapped; binding cap bounds pairs deterministically") {
    // dense hour: 200 identical intervals share one bin — uncapped
    // pairing is 200*199/2 = 19900, the cap must bound it to C(64,2)
    val h = 3600L
    val dense = (0L until 200L).map(i => (i, 10L, 20L)).toDF("id", "s", "e")
      .select(struct($"id").as("iid"), $"s", $"e")
    val capped = RangeJoin.cappedIntervalOverlapSelf(dense, "iid", "s", "e", h)
      .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(1).getLong(0)))
    assert(capped.length == 64 * 63 / 2, "cap^2 pair bound per bin")
    // deterministic smallest-id survivorship
    assert(capped.flatMap(p => Seq(p._1, p._2)).toSet == (0L until 64L).toSet)
    // sparse shape: cap dormant, equals the uncapped form pair-for-pair
    val iv = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 7200L, 7300L),
      (4L, 95L, 4000L), (5L, 3999L, 7250L), (6L, 9000L, 9001L))
      .toDF("id", "s", "e").select(struct($"id").as("iid"), $"s", $"e")
    val got = RangeJoin.cappedIntervalOverlapSelf(iv, "iid", "s", "e", h)
      .select($"id_a.id", $"id_b.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = iv.select($"iid.id".as("ia"), $"s".as("sa"), $"e".as("ea"))
    val b = iv.select($"iid.id".as("ib"), $"s".as("sb"), $"e".as("eb"))
    val naive = a.join(b, $"ia" < $"ib" && $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == naive.sorted, "dormant cap is exact, one row per pair")
    assert(got.size == got.toSet.size && naive.nonEmpty)
  }

  test("events-to-session range join reproduces session membership") {
    // intervals = each user's sessions (from the sessionize operator's
    // first/last event times); every event must land in exactly one
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts_ns")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    val gapNs = 30L * 60 * 1000000000L
    val sessions = ev
      .withColumn("prev", lag($"ts_ns", 1).over(byUser))
      .withColumn("brk", when($"prev".isNull || $"ts_ns" - $"prev" > gapNs, 1L).otherwise(0L))
      .withColumn("sid", sum($"brk").over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id".as("su"), $"sid")
      .agg(min($"ts_ns").as("start"), max($"ts_ns").as("end"))
    val joined = RangeJoin.binnedPointInInterval(
        ev, "ts_ns", sessions, "start", "end", binSize = 3600L * 1000000000L)
      .filter($"user_id" === $"su")
    // each event falls into exactly one of its user's sessions
    assert(joined.groupBy("event_id").count().filter($"count" =!= 1).count() == 0)
  }

  test("hash sampling is deterministic, key-stable, and near the target rate") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val s1 = Sampling.sampleByHash(docs, "doc_id", 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.sampleByHash(docs, "doc_id", 0.1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "same keys every run")
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.1) < 0.06, s"rate=${s1.size / n}")
    // monotone: a 20% sample contains the 10% sample
    val s3 = Sampling.sampleByHash(docs, "doc_id", 0.2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("priority sample biases toward heavy docs, deterministic, top-k plan") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val k = 250
    val s1 = Sampling.prioritySample(spark, sf, k)
    // TakeOrderedAndProject, not a global sort: per-partition heaps of k
    assert(s1.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val picked = s1.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(picked.length == k)
    // weight bias: the char-mass of the sample beats a uniform draw
    val meanAll = docs.agg(org.apache.spark.sql.functions.avg("n_chars"))
      .collect()(0).getDouble(0)
    val meanPicked = picked.map(_._2).sum.toDouble / k
    assert(meanPicked > meanAll,
      s"weighted sample mean $meanPicked must exceed corpus mean $meanAll")
    // key-stable: identical selection on re-run
    val s2 = Sampling.prioritySample(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s2.toSeq == picked.toSeq)
  }

  test("split covers every row exactly once with sane proportions") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sp = Sampling.split(docs, "doc_id")
    assert(sp.count() == docs.count())
    val byS = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
  }

  test("token budget sweep: best-first cumsum, kept is a prefix within budget") {
    val rows = Sampling.tokenBudgetSelect(spark, sf).collect()
      .sortBy(-_.getLong(0))
    assert(rows.nonEmpty)
    var cum = 0L
    val grand = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      cum += r.getLong(2)
      assert(r.getLong(3) == cum, s"cum_tok mismatch at bucket ${r.getLong(0)}")
      assert(r.getBoolean(4) ==
        (cum * 1000000L <= Sampling.BudgetPpm * grand))
    }
    // kept is a prefix of the best-first order: once false, always false
    val kept = rows.map(_.getBoolean(4))
    assert(!kept.dropWhile(identity).contains(true))
  }

  test("stratified sampling applies per-stratum rates and leaves the rest intact") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val mixed = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.25))
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-target strata pass through untouched
    (before.keySet - "en").foreach { l => assert(after(l) == before(l), l) }
    // the down-weighted stratum lands near 25%, and is a strict subset
    val rate = after.getOrElse("en", 0L).toDouble / before("en")
    assert(rate > 0.10 && rate < 0.40, s"en rate=$rate")
    val kept = mixed.filter($"lang" === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.filter($"lang" === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all))
    // same hash, same keys: rerun keeps the identical subset
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 0.25))
      .filter($"lang" === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
  }

  test("q155 largest-remainder allocation is exact-k and replayable") {
    val out = Sampling.stratifiedAlloc(spark, sf)
      .select($"lang", $"source", $"n_docs", $"alloc", $"n_sel")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // selection fills its quota exactly, per stratum
    out.foreach { case (l, s, _, alloc, nSel) =>
      assert(nSel === alloc, s"stratum ($l,$s)") }
    // Σ alloc == k == (N * AllocPct) div 100, exactly
    val n = out.map(_._3).sum
    val k = n * Sampling.AllocPct / 100L
    assert(out.map(_._4).sum === k, s"allocations must sum to k=$k")
    // Scala replay of Hamilton rounding from the stratum counts alone
    val floorA = out.map { case (l, s, nd, _, _) => ((l, s), k * nd / n) }.toMap
    val deficit = k - floorA.values.sum
    val topUp = out.map { case (l, s, nd, _, _) => ((l, s), k * nd % n) }
      .sortBy { case ((l, s), rem) => (-rem, l, s) }
      .take(deficit.toInt).map(_._1).toSet
    out.foreach { case (l, s, _, alloc, _) =>
      val expect = floorA((l, s)) + (if (topUp((l, s))) 1L else 0L)
      assert(alloc === expect, s"stratum ($l,$s)")
    }
  }
}
