package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.{Relational, Sampling, Sketches, Similarity, TextOps}
import graft.sources.Tables

/** Unit/property coverage for the round-5 sketch-audit operators
  * (q74–q79). The oracle gate proves cross-engine equality; these specs
  * prove the sketch-side CLAIMS — Bloom has no false negatives, the
  * prefilter changes the plan but never the result, count-min is
  * one-sided, the Lloyd step conserves mass, audits actually audit.
  */
class SketchAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("q74 bloom-prefiltered dedup equals the plain exact anti-join") {
    val viaBloom = Sketches.bloomPrefilterDedup(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sf)
    val plain = TextOps.dedupAgainstCorpus(
      docs, docs.filter(col("doc_id") % 3 =!= 0))
      .collect().map(_.getLong(0)).toSet
    assert(viaBloom == plain)
  }

  test("bloom filter has no false negatives over the corpus it was built from") {
    GraftFunctions.ensureRegistered(spark)
    val fps = Tables.documents(spark, sf)
      .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
    val n = fps.count()
    val bf = fps.agg(expr(s"${GraftFunctions.BloomBuildName}(xxhash64(fp), " +
      s"$n, ${Sketches.bloomBitsFor(n)})")).head
      .getAs[Array[Byte]](0)
    val misses = fps.withColumn("hit",
      call_function(GraftFunctions.BloomContainsName, lit(bf), xxhash64(col("fp"))))
      .filter(!col("hit")).count()
    assert(misses == 0L)
  }

  test("derived bloom sizing holds measured FPR <= 2x target across corpus sizes") {
    GraftFunctions.ensureRegistered(spark)
    // the sizing must adapt: same code, two corpus scales, same bound
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fps = Tables.documents(spark, dir)
        .select(TextOps.fingerprint(col("text")).as("fp")).distinct()
      val n = fps.count()
      val bits = Sketches.bloomBitsFor(n)
      val bf = fps.agg(expr(s"${GraftFunctions.BloomBuildName}(xxhash64(fp), " +
        s"$n, $bits)")).head.getAs[Array[Byte]](0)
      // probe keys are hashes of strings outside any fingerprint space —
      // non-members w.p. 1; hit rate over them IS the false-positive rate
      val probes = 200000L
      val hits = spark.range(probes)
        .withColumn("hit", call_function(GraftFunctions.BloomContainsName,
          lit(bf), xxhash64(concat(lit("nonmember_probe_"), col("id")))))
        .filter(col("hit")).count()
      val fpr = hits.toDouble / probes
      assert(fpr <= 2 * Sketches.BloomTargetFpr,
        s"$dir: n=$n bits=$bits measured FPR=$fpr")
    }
  }

  test("count-min estimates are one-sided: est >= exact for EVERY token") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val bytes = toks.agg(expr(
      s"count_min_sketch(token, ${Sketches.CmsEps}d, " +
        s"${Sketches.CmsConfidence}d, ${Sketches.CmsSeed})")).head
      .getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (t, n) =>
      assert(cms.estimateCount(t) >= n, s"one-sided bound broken for '$t'")
    }
  }

  test("q135 kmv distinct: estimator exercised, audit green, plan is TakeOrdered") {
    val row = graft.operators.Sketches.kmvDistinctChecked(spark, sf).collect()(0)
    val (nKept, est, exact, ok) =
      (row.getLong(1), row.getLong(3), row.getLong(4), row.getBoolean(6))
    assert(ok, s"kmv_ok false: est $est vs exact $exact")
    // the estimator branch must actually run (a tiny key space would
    // leave it dormant and the audit vacuous)
    assert(nKept == graft.operators.Sketches.KmvK.toLong, s"sketch undersized: $nKept")
    assert(est != exact, "estimate should differ from exact (it is an estimate)")
    // bottom-k must plan as TakeOrderedAndProject (per-partition heaps),
    // never a global sort of the hash space
    val p = graft.operators.Sketches.kmvDistinctChecked(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("kmv sketch is mergeable: min-k over unioned shard sketches == whole-corpus sketch") {
    import org.apache.spark.sql.functions._
    val k = graft.operators.Sketches.KmvK
    val sh = graft.operators.Dedup.shingles(
      graft.sources.Tables.documents(spark, sf))
    val hashes = sh.select(expr(
      s"${graft.functions.GraftFunctions.Md5PrefixName}(sh, 8)").as("hv"))
    // shard by doc-hash parity, sketch each shard, merge = min-k of union
    val shardSketches = Seq(0, 1).map { par =>
      graft.operators.Dedup.shingles(
          graft.sources.Tables.documents(spark, sf))
        .filter(col("doc_id") % 2 === par)
        .select(expr(s"${graft.functions.GraftFunctions.Md5PrefixName}(sh, 8)").as("hv"))
        .distinct().orderBy(col("hv").asc).limit(k)
    }
    val merged = shardSketches.reduce(_ unionAll _)
      .distinct().orderBy(col("hv").asc).limit(k)
      .collect().map(_.getLong(0)).toSeq
    val whole = hashes.distinct().orderBy(col("hv").asc).limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(merged == whole, "shard-merge must reproduce the whole-corpus sketch")
  }

  test("q75 heavy hitters: k rows, audit green, counts exact") {
    val rows = Sketches.heavyHittersChecked(spark, sf).collect()
    assert(rows.length == Sketches.HeavyHittersK)
    assert(rows.forall(_.getAs[Boolean]("cms_ok")))
    // ranks are 1..k and counts are non-increasing in rank order
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to Sketches.HeavyHittersK))
    val ns = byRank.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("q76 lloyd step conserves vectors and reports sane shifts") {
    val rows = Similarity.kmeansRefine(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total,
      "every vector must land in exactly one bucket")
    rows.foreach { r =>
      assert(r.getAs[Long]("norm_new_q") > 0L)
      val shift = r.getAs[Long]("shift_cos_ppm")
      // quantized cosine can exceed 1e6 by at most rounding slack
      assert(shift > 0L && shift <= 1000001L,
        s"bucket ${r.getAs[Long]("bucket")}: implausible shift $shift")
    }
  }

  test("q77 audit: gk_ok everywhere and medians equal the exact operator") {
    val audited = Sketches.quantileSketchChecked(spark, sf).collect()
    assert(audited.nonEmpty)
    assert(audited.forall(_.getAs[Boolean]("gk_ok")))
    val exact = Relational.exactMedianByPriority(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    audited.foreach { r =>
      assert(r.getAs[Long]("median_x2_c") == exact(r.getString(0)))
    }
  }

  test("q78 contamination only flags test-split docs, scores in range") {
    val rows = TextOps.contaminationCheck(spark, sf).collect()
    val testIds = Sampling.split(Tables.documents(spark, sf), "doc_id")
      .filter(col("split") === "test").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(testIds.contains(r.getAs[Long]("doc_id")))
      val ppm = r.getAs[Long]("contam_ppm")
      assert(ppm >= TextOps.ContamPpm && ppm <= 1000000L)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_fp"))
    }
  }

  test("q79 mix weights: caps at 1e6, never grows a language") {
    val rows = Sampling.mixWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("weight_ppm")
      assert(w > 0L && w <= 1000000L)
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("tok_total"))
    }
    // the over-represented language is the one that gets cut
    val byShare = rows.sortBy(-_.getAs[Long]("share_ppm"))
    assert(byShare.head.getAs[Long]("weight_ppm") <=
      byShare.last.getAs[Long]("weight_ppm"))
  }

  test("q197 kmv intersections: undersized sketches are exact, invariants hold") {
    val k = Sketches.kmvKFor(Sketches.KmvTargetRelErr)
    val rows = Sketches.kmvIntersections(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nKept, c) = (r.getAs[Long]("n_kept"), r.getAs[Long]("c"))
      val (est, exact) =
        (r.getAs[Long]("est_inter"), r.getAs[Long]("exact_inter"))
      assert(c <= nKept && est >= 0L)
      // the undersized rule: the sketch IS the union, c IS the answer
      if (nKept < k) assert(est == exact,
        s"${r.getString(0)}/${r.getString(1)}: est $est != exact $exact")
    }
  }

  test("q230 CMS F2 is one-sided and inside the Markov bound") {
    val r = Sketches.cmsSelfJoinSize(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nRows, nKeys, f2x, f2e) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // F2 bounds: at least F1²/n_keys (uniform), at most F1² (one key)
    assert(f2x >= nRows * nRows / math.max(nKeys, 1L) && f2x <= nRows * nRows)
    // collisions only ADD mass — the estimate can never undershoot
    assert(f2e >= f2x, s"one-sidedness violated: est $f2e < exact $f2x")
    assert(row.getBoolean(6), s"Markov bound breached: $row")
  }

  test("q230 exact F2 replays a driver-side count") {
    val keys = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).collect().map(_.getLong(0))
    val f2 = keys.groupBy(identity).map { case (_, v) =>
      v.length.toLong * v.length }.sum
    val got = Sketches.cmsSelfJoinSize(spark, sf).collect().head.getLong(2)
    assert(got == f2)
  }

  test("q235 join-size estimate is one-sided and replays the exact join") {
    val r = Sketches.cmsJoinSize(spark, sf).collect().head
    val (nA, nB, jx, je) =
      (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5))
    assert(nA > 0 && nB > 0 && jx > 0)
    assert(je >= jx, s"one-sidedness violated: est $je < exact $jx")
    assert(jx <= nA * nB)
    assert(r.getBoolean(8), s"Markov bound breached: $r")
    // driver-side exact replay
    val rows = Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey", "year(l_shipdate) AS y").collect()
    val a = rows.filter(_.getInt(1) == Sketches.JoinSizeYearA)
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.length.toLong }
    val b = rows.filter(_.getInt(1) == Sketches.JoinSizeYearB)
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.length.toLong }
    val exact = a.map { case (k, n) => n * b.getOrElse(k, 0L) }.sum
    assert(jx == exact)
  }

  test("q236 histogram selectivity: exact full buckets, bounded partials") {
    val r = Sketches.histogramSelectivity(spark, sf).collect().head
    val (n, lo, hi, est, exact, pm) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7))
    assert(lo < hi && exact > 0 && exact <= n)
    assert(math.abs(est - exact) <= pm, s"theorem breached: $r")
    assert(r.getBoolean(8))
    // driver-side exact replay of the range count
    val got = Tables.orders(spark, sf)
      .select(graft.operators.Determinism.cents(col("o_totalprice")))
      .collect().map(_.getLong(0)).count(v => v >= lo && v <= hi)
    assert(exact == got)
  }
}
