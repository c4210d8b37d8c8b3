package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextOps}

class NorthStarSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("ivf knn recall@5 vs brute force is usable") {
    val bf = Similarity.bruteForceKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.nonEmpty)
    val recall = (bf intersect ivf).size.toDouble / bf.size
    // nprobe=4 of nlist=16 buckets: expect to find a meaningful share of
    // true neighbors, far above the random baseline (~4/16 of the space)
    assert(recall >= 0.2, s"recall=$recall")
  }

  test("width sweep: one point per swept k, hits bounded by truth") {
    val rows = Similarity.pqWidthRecallSweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq ===
      Similarity.SweepPqKs.map(_.toLong))
    val nTrue = rows.head.getAs[Long]("n_true")
    assert(nTrue > 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") === nTrue,
        "every point grades against the ONE shared brute truth")
      assert(r.getAs[Long]("n_hits") <= nTrue)
      assert(r.getAs[Long]("recall_ppm") ===
        r.getAs[Long]("n_hits") * 1000000L / nTrue)
    }
  }

  test("capped codebook: width law pinned, audit self-consistent, twin really differs") {
    // the clamp [PqKCapFloor, PqKCap]: below the production floor where
    // √(N/4) < 16 (so the gate grades a DISTINCT chain), capped where
    // the N^1.5 coding term would grow
    assert(Similarity.pqKCappedFor(500L) === 11)   // sf0.01: 11 vs pqKFor 16
    assert(Similarity.pqKCappedFor(50L) === Similarity.PqKCapFloor)
    assert(Similarity.pqKCappedFor(200000L) === Similarity.PqKCap) // 100×: 64 vs 224
    assert(Similarity.pqKCappedFor(2000000L) === Similarity.PqKCap) // 1000×: 64 vs 707
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    val kCap = Similarity.pqKCappedFor(n)
    assert(kCap != Similarity.pqKFor(n),
      "at every graded scale the capped width must differ from the derived one")
    // the histogram codes the whole corpus at the capped width
    val hist = Similarity.pqCappedCodeHistogram(spark, sf).collect()
    assert(hist.map(_.getAs[Long]("n_vecs")).sum ===
      n * Similarity.PqSubspaces)
    hist.foreach { r =>
      assert(r.getAs[Long]("k") === kCap.toLong)
      assert(r.getAs[Long]("code") < kCap.toLong)
    }
    // the recall audit is internally consistent (ppm law) and grades
    // two genuinely different searches
    val audit = Similarity.adcCappedRecallAudit(spark, sf).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Long]("fullk_recall_ppm") ===
        r.getAs[Long]("n_fullk_hit") * 1000000L / r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("capk_recall_ppm") ===
        r.getAs[Long]("n_capk_hit") * 1000000L / r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_capk_hit") <= r.getAs[Long]("n_true"))
    }
  }

  test("ivf assignment covers every vector exactly once") {
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    val assigned = Similarity.ivfAssignments(spark, sf)
    assert(assigned.count() == n)
    assert(assigned.select("vec_id").distinct().count() == n)
  }

  test("pq codes: every vector coded, codebook vectors reconstruct exactly") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val codes = Similarity.pqCodes(spark, sf).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      (1 to Similarity.PqSubspaces).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0 && c < Similarity.PqK, s"code out of codebook range: $c")
      }
      assert(r.getAs[Long]("recon_err_q") >= 0L)
    }
    // a codebook seed vector's subvectors ARE codebook entries: its
    // quantized reconstruction error must be exactly zero
    codes.filter(_.getLong(0) < Similarity.PqK).foreach { r =>
      assert(r.getAs[Long]("recon_err_q") == 0L,
        s"seed vector ${r.getLong(0)} must reconstruct exactly")
    }
  }

  test("ivf-pq adc search: valid ranking, usable recall vs brute force") {
    val rows = Similarity.ivfPqSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    // per query: exactly ranks 1..5, non-negative ADC, never self
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length),
        s"ranks must be 1..k for query $qid")
      rs.foreach { r =>
        assert(r.getLong(2) >= 0L, "ADC distance is a sum of exact squared terms")
        assert(r.getLong(1) != qid, "self must be excluded")
      }
    }
    val bf = Similarity.bruteForceKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    info(s"ivf-pq recall@5 = $recall")
    // lossier than full-vector IVF (probe misses + quantization), but
    // must stay far above random (5/500 ≈ 0.01)
    assert(recall >= 0.1, s"recall=$recall")
  }

  test("decontaminate: kept docs are under threshold and partition the train split") {
    import org.apache.spark.sql.functions._
    val kept = TextOps.decontaminateTrain(spark, sf).collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      assert(r.getAs[Long]("contam_ppm") < TextOps.ContamPpm)
      assert(r.getAs[Long]("n_eval_hits") <= math.max(r.getAs[Long]("n_sh"), 0L))
    }
    val trainTotal = graft.sources.Tables.documents(spark, sf)
      .filter(graft.operators.Sampling.hashBucket("doc_id") < 800000L).count()
    assert(kept.length <= trainTotal)
    // the word-salad corpus has heavy phrase reuse, so SOME doc must be
    // dropped — otherwise the threshold isn't exercised
    assert(kept.length < trainTotal, "expected at least one contaminated drop")
  }

  test("token rarity: integer surprisal properties hold corpus-wide") {
    val docsN = graft.sources.Tables.documents(spark, sf).count()
    val rows = TextOps.tokenRarityScore(spark, sf).collect()
    assert(rows.length == docsN, "every document must be scored")
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tok")
      val sumIdf = r.getAs[Long]("sum_idf")
      val maxIdf = r.getAs[Long]("max_idf")
      val score = r.getAs[Long]("rarity_score")
      assert(nTok > 0)
      // every occurrence weighs ≥ 1 (grand DIV cnt ≥ 1 since cnt ≤ grand)
      assert(sumIdf >= nTok)
      assert(maxIdf >= 1L && maxIdf <= sumIdf)
      assert(score == sumIdf / nTok)
    }
  }

  test("shard balance: shards partition the corpus with sane load factors") {
    val docsN = graft.sources.Tables.documents(spark, sf).count()
    val rows = graft.operators.Sampling.shardBalance(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("shard")).forall(s =>
      s >= 0 && s < graft.operators.Sampling.Shards))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docsN,
      "shards must partition the corpus exactly")
    // load_ppm averages 1e6 by construction; every shard is non-empty
    // at this corpus/shard ratio and nothing is pathologically hot
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Long]("load_ppm") > 0)
    }
  }

  test("dup-span scrub: cloned docs are fully covered, unique doc untouched") {
    import spark.implicits._
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, text, "en", "a", 40L), (2L, text, "en", "b", 40L),
      (3L, (100 until 160).map(i => s"uniq$i").mkString(" "), "en", "a", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scrub = Dedup.dupSpanScrubFor(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("n_clean"), r.getAs[Long]("scrub_ppm"))).toMap
    // clones: every position inside a duplicated span → zero clean tokens
    assert(scrub(1L) == ((40L, 40L, 0L, 1000000L)))
    assert(scrub(2L) == ((40L, 40L, 0L, 1000000L)))
    // unique doc has no duplicated span and is omitted entirely
    assert(!scrub.contains(3L))
  }

  test("pq-lsh pairs: band agreement implies equal codes on that slice") {
    val rows = Similarity.pqLshPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val codes = Similarity.pqCodes(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (0 until Similarity.PqSubspaces).map(m => r.getLong(1 + m))).toMap
    rows.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getAs[Long]("n_bands"))
      assert(a < b, "pairs are ordered")
      assert(n >= 1 && n <= Similarity.PqBands)
      // n_bands must equal the actual number of agreeing code bands
      val agree = (0 until Similarity.PqBands).count { band =>
        codes(a)(2 * band) == codes(b)(2 * band) &&
          codes(a)(2 * band + 1) == codes(b)(2 * band + 1)
      }
      assert(agree == n, s"pair ($a,$b): n_bands=$n but $agree bands agree")
    }
  }

  test("incremental lsh: pairs cross the split, clones across splits are caught") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val bucket = graft.operators.Sampling.hashBucket("doc_id")
    val corpusIds = docs.filter(bucket < 800000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = docs.filter(bucket >= 900000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = Dedup.incrementalLshPairs(spark, sf).collect()
    pairs.foreach { r =>
      assert(corpusIds.contains(r.getLong(0)), "left side must be corpus")
      assert(batchIds.contains(r.getLong(1)), "right side must be batch")
    }
    // every exact cross-split duplicate text MUST appear as a candidate
    // (identical docs share all bands)
    val byFp = docs.withColumn("fp", TextOps.fingerprint(col("text")))
      .select("doc_id", "fp").collect().groupBy(_.getString(1))
    val crossDups = byFp.values.flatMap { rs =>
      val ids = rs.map(_.getLong(0)).toSeq
      for {
        a <- ids.filter(corpusIds); b <- ids.filter(batchIds)
      } yield (a, b)
    }.toSet
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(crossDups.subsetOf(found),
      s"missing exact cross-split dups: ${crossDups -- found}")
  }

  test("dup-span profile: identical docs are fully duplicated spans") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, text, "en", "a", 40L), (2L, text, "en", "b", 40L),
      (3L, (100 until 160).map(i => s"uniq$i").mkString(" "), "en", "a", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val prof = Dedup.dupSpanProfileFor(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dup_ppm")).toMap
    // the two clones share every shingle (cross-source!); the unique
    // doc has no duplicated span and is omitted
    assert(prof == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("minhash similarity correlates with jaccard on identical docs") {
    // a document is always a perfect match with itself: signatures equal
    val sig = Dedup.minhashSignatures(spark, sf)
    assert(sig.count() > 0)
    // signature values are 32-bit non-negative
    val row = sig.limit(1).collect()(0)
    (1 to 8).foreach { i =>
      val v = row.getLong(i)
      assert(v >= 0 && v <= 0xFFFFFFFFL)
    }
  }

  test("simhash of duplicate texts is identical") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    val dups = docs.groupBy(TextOps.fingerprint(col("text")).as("fp"))
      .count().filter(col("count") > 1)
    val sh = Dedup.simhash(spark, sf)
    val joined = docs.withColumn("fp", TextOps.fingerprint(col("text")))
      .join(sh, "doc_id")
      .groupBy(col("fp"))
      .agg(countDistinct(col("simhash")).as("nsig"), count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("nsig") > 1)
    assert(joined.count() == 0, "duplicate texts must share a simhash")
    assert(dups.count() >= 0)
  }

  test("curation pipeline: dedup + gate + split survive and materialize partitioned") {
    import org.apache.spark.sql.functions._
    val curated = graft.operators.CurationPipeline.curate(spark, sf)
    val n = curated.count()
    assert(n > 0 && n <= graft.sources.Tables.documents(spark, sf).count())
    // no duplicate fingerprints survive
    val dups = graft.sources.Tables.documents(spark, sf)
      .withColumn("fp", operators.TextOps.fingerprint(col("text")))
      .join(curated.select("doc_id"), "doc_id")
      .groupBy("fp").count().filter(col("count") > 1)
    assert(dups.count() == 0)
    // materialized output is partitioned by split and prunable
    val out = java.nio.file.Files.createTempDirectory("graft-curated").toString
    graft.operators.CurationPipeline.write(spark, sf, out)
    val back = spark.read.parquet(out)
    assert(back.count() == n)
    assert(new java.io.File(s"$out/split=train").exists())
  }

  test("lsh candidates are a superset of exact duplicate pairs") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("fp", TextOps.fingerprint(col("text")))
    val a = docs.select(col("fp"), col("doc_id").as("doc_a"))
    val b = docs.select(col("fp"), col("doc_id").as("doc_b"))
    val dupPairs = a.join(b, "fp").filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.lshCandidatePairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.subsetOf(cands),
      s"missing exact-dup pairs: ${(dupPairs -- cands).take(5)}")
  }

  test("incremental dedup: corpus fingerprints remove re-crawled batch rows") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha text"), (2L, "beta text"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Alpha   text"), // corpus dup modulo normalization → dropped
      (11L, "gamma text"),   // new
      (12L, "gamma  TEXT"),  // within-batch dup of 11 → keep-first
      (13L, "delta text"))   // new
      .toDF("doc_id", "text")
    val survivors = TextOps.dedupAgainstCorpus(batch, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(11L, 13L))
  }

  test("ann recall audit agrees with independently computed recall") {
    val rows = Similarity.annRecallAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val bf = Similarity.bruteForceKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ivf = Similarity.ivfKnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ivfPqSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val qid = r.getLong(0)
      val truth = bf.filter(_._1 == qid)
      assert(r.getAs[Long]("n_true") == truth.length)
      assert(r.getAs[Long]("n_ivf_hit") == truth.count(ivf.contains))
      assert(r.getAs[Long]("n_pq_hit") == truth.count(pq.contains))
      assert(r.getAs[Long]("ivf_recall_ppm") ==
        r.getAs[Long]("n_ivf_hit") * 1000000L / r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("n_pq_hit") <= r.getAs[Long]("n_true"))
    }
  }

  test("dedup survivors: longest member kept, dropped mass accounted") {
    val chars = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).map { case (c, rs) => c -> rs.map(_._1).sorted }
    Dedup.dedupSurvivors(spark, sf).collect().foreach { r =>
      val comp = r.getLong(0)
      val ids = members(comp)
      assert(ids.length >= 2 && ids.length == r.getAs[Long]("n_members"))
      val best = ids.maxBy(id => (chars(id), -id))
      assert(r.getAs[Long]("survivor_id") == best)
      assert(r.getAs[Long]("survivor_chars") == chars(best))
      assert(r.getAs[Long]("dropped_chars") ==
        ids.map(chars).sum - chars(best))
    }
  }

  test("source divergence: exact TV ppm on a hand-computed corpus") {
    import spark.implicits._
    // global: a 4/8, b 3/8, c 1/8 → p_g = 500000, 375000, 125000
    // srcX (a a a b): p_s = 750000, 250000, absent c
    //   TV = |750000-500000| + |250000-375000| + 125000 = 500000
    // srcY (a b b c): p_s = 250000, 500000, 250000
    //   TV = 250000 + 125000 + 125000 = 500000
    val docs = Seq(("srcX", "a a a b"), ("srcY", "a b b c"))
      .toDF("source", "text")
    val rows = TextOps.sourceDivergenceFor(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows("srcX") == ((2L, 4L, 500000L)))
    assert(rows("srcY") == ((3L, 4L, 500000L)))
    // a source that IS the corpus distribution diverges by zero
    val uniform = Seq(("s1", "a b"), ("s2", "a b")).toDF("source", "text")
    TextOps.sourceDivergenceFor(uniform).collect().foreach { r =>
      assert(r.getLong(3) == 0L, s"uniform source ${r.getString(0)}")
    }
  }

  test("curation delta: statuses partition the corpus, mass conserves") {
    val total = graft.sources.Tables.documents(spark, sf).count()
    val removedIds = Dedup.dedupSurvivors(spark, sf).collect()
      .map(r => r.getAs[Long]("n_members") - 1).sum
    val rows = Dedup.curationDelta(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.values.map(_._1).sum == total, "statuses must partition the corpus")
    rows.get("removed_dup").foreach { case (n, _, after) =>
      assert(after == 0L, "removed docs keep zero tokens")
      assert(n == removedIds, "removed count must equal non-survivor count")
    }
    rows.values.foreach { case (_, before, after) =>
      assert(after <= before, "curation never adds tokens")
    }
    rows.get("kept_clean").foreach { case (_, before, after) =>
      assert(after == before, "clean docs are untouched")
    }
  }

  test("lsh recall audit agrees with set arithmetic over truth and candidates") {
    val truth = Dedup.ngramJaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cand = Dedup.lshCandidatePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = truth.groupBy(_._3 / 100000).map { case (b, ps) =>
      b -> ((ps.length.toLong, ps.count(p => cand((p._1, p._2))).toLong))
    }
    val rows = Dedup.lshRecallAudit(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expected.keySet)
    rows.foreach { r =>
      val (nTrue, nHit) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_true") == nTrue)
      assert(r.getAs[Long]("n_hit") == nHit)
      assert(r.getAs[Long]("recall_ppm") == nHit * 1000000L / nTrue)
    }
  }

  test("funnel stages agree with a brute-force per-user replay") {
    import graft.operators.EventsOps
    val evs = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = EventsOps.FunnelWindowNs
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      def firstAfter(t: String, lo: Long): Option[Long] =
        es.filter(e => e._2 == t && e._3 > lo && e._3 <= lo + w)
          .map(_._3).sorted.headOption
      val t1 = es.filter(_._2 == "view").map(_._3).sorted.headOption
      val t2 = t1.flatMap(firstAfter("click", _))
      val t3 = t2.flatMap(firstAfter("purchase", _))
      u -> (if (t3.isDefined) 3L else if (t2.isDefined) 2L
            else if (t1.isDefined) 1L else 0L)
    }
    val byStage = expected.values.groupBy(identity).map { case (s, xs) =>
      s -> xs.size.toLong }
    val rows = EventsOps.funnelStages(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == byStage.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == byStage(r.getLong(0)),
        s"stage ${r.getLong(0)} user count")
      assert(r.getLong(2) == r.getLong(1) * 1000000L / expected.size)
    }
  }

  test("retention cohorts agree with a brute-force replay") {
    val dayNs = 86400000000000L
    val grid = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1) / dayNs)).distinct
    val cohort = grid.groupBy(_._1).map { case (u, ws) =>
      u -> ws.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (w, xs) =>
      w -> xs.size.toLong }
    val expected = grid.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, xs) => k -> xs.length.toLong }
    val rows = graft.operators.EventsOps.retentionCohorts(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == expected(k), s"n_active at $k")
      assert(r.getLong(3) == expected(k) * 1000000L / sizes(r.getLong(0)))
    }
    // offset 0 is every cohort member by definition
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(3) == 1000000L)
    }
  }

  test("derived ivf histogram covers every vector under the √N width") {
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    val rows = Similarity.ivfDerivedHistogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_assigned")).sum == n)
    val nlist = Similarity.nlistFor(n)
    assert(rows.length <= nlist)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < nlist, "bucket in index range")
      assert(r.getAs[Long]("min_vec") <= r.getAs[Long]("max_vec"))
    }
  }

  test("gopher gates agree with a brute-force per-doc replay") {
    import graft.operators.CorpusPrep
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.flatMap { case (_, lang, text) =>
      val toks = text.trim.split("\\s+").toSeq
      if (toks.length < 2) None else {
        val nTok = toks.length.toLong
        val mlen = text.replaceAll("\\s", "").length.toLong * 1000000L / nTok
        val stop = toks.count(CorpusPrep.GateStopWords.contains).toLong * 1000000L / nTok
        val topTok = toks.groupBy(identity).values.map(_.length).max.toLong * 1000000L / nTok
        val distinct = toks.distinct.length.toLong * 1000000L / nTok
        val passed =
          (if (nTok >= 30 && nTok <= 100000) 1 else 0) +
          (if (mlen >= 3000000 && mlen <= 5000000) 1 else 0) +
          (if (stop >= 50000 && stop <= 400000) 1 else 0) +
          (if (topTok <= 120000) 1 else 0) +
          (if (distinct >= 450000) 1 else 0)
        Some(((lang, passed.toLong), nTok))
      }
    }
    val byKey = expected.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val rows = CorpusPrep.gopherGates(spark, sf).collect()
    assert(rows.length == byKey.size)
    rows.foreach { r =>
      val (n, tok) = byKey((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n, s"n_docs at ${(r.getString(0), r.getLong(1))}")
      assert(r.getLong(3) == tok)
    }
  }

  test("cross-source matrix conserves the candidate pair count") {
    val pairs = Dedup.lshCandidatePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val src = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (src(a), src(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rows = Dedup.crossSourceDupMatrix(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_dup_pairs")).sum == pairs.length.toLong)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "matrix is orientation-free")
      assert(r.getLong(2) == expected((r.getString(0), r.getString(1))))
    }
  }

  test("simhash pairs match the brute-force hamming-radius set") {
    val sigs = Dedup.simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= Dedup.SimhashHammingMax
    } yield (a, b) -> h.toLong).toMap
    val rows = Dedup.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    // every emitted pair is a true radius-3 pair with the exact distance;
    // band buckets over BandCap truncate deterministically, so the op is
    // a subset of the brute-force set, never a superset
    rows.foreach { case (pair, h) =>
      assert(truth.get(pair).contains(h), s"pair $pair hamming $h")
    }
    // the sf0.001 corpus is 500 docs; even with cap truncation the
    // generator must recover the bulk of the radius-3 mass
    assert(rows.size * 10 >= truth.size * 5,
      s"recall too low: ${rows.size}/${truth.size}")
  }

  test("containment catches a fragment symmetric jaccard misses") {
    import spark.implicits._
    val big = (1 to 20).map(i => s"w$i").mkString(" ") // 18 shingles
    val fragment = (1 to 5).map(i => s"w$i").mkString(" ") // 3, all ⊂ big
    val docs = Seq((1L, "src0", big), (2L, "src0", fragment))
      .toDF("doc_id", "source", "text")
    // jaccard = 3/18 ≈ 0.17 — below the 0.3 near-dup threshold
    assert(Dedup.ngramJaccardPairsFor(docs).count() == 0)
    val c = Dedup.containmentPairsFor(docs).collect()
    assert(c.length == 1)
    assert(c(0).getLong(0) == 1L && c(0).getLong(1) == 2L)
    assert(c(0).getLong(3) == 1000000L, "fragment direction is total containment")
    assert(c(0).getLong(2) < 500000L)
  }

  test("trigram quality: Scala replay of the frequency model matches the operator") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.length >= 3)
    def hb(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16) % 1000000L
    def tris(t: String): Seq[String] = (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val model = scala.collection.mutable.Map.empty[String, Long]
    docs.filter(d => hb(d._1) < 800000L).foreach(d =>
      tris(d._2).foreach(tg => model(tg) = model.getOrElse(tg, 0L) + 1L))
    val total = model.values.sum
    val expected = docs.map { case (id, t) =>
      val ppms = tris(t).map(tg => model.getOrElse(tg, 0L) * 1000000L / total)
      id -> (ppms.length.toLong, ppms.sum / ppms.length)
    }.toMap
    val got = graft.operators.TextOps.charTrigramQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("ivf incremental ingest: Scala replay of split assignment and growth") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def hb(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16) % 1000000L
    val cents = emb.filter(_._1 < Similarity.IvfNlist).sortBy(_._1)
    def dotQ(a: Array[Float], b: Array[Float]): Long =
      (0 until math.min(a.length, b.length)).map(i =>
        math.floor(a(i).toDouble * b(i).toDouble * 1.0e12).toLong).sum
    def assign(v: Array[Float]): (Long, Long) = {
      // strictly-greater argmax = first best index, lowest c_id on ties
      var best = Long.MinValue; var bid = -1L
      cents.foreach { case (cid, c) =>
        val d = dotQ(v, c); if (d > best) { best = d; bid = cid }
      }
      (bid, best)
    }
    val sides = emb.flatMap { case (id, v) =>
      val h = hb(id)
      if (h < 800000L) Some((assign(v), 0)) else if (h >= 900000L) Some((assign(v), 1)) else None
    }
    val expected = sides.groupBy(_._1._1).map { case (bucket, xs) =>
      val nIdx = xs.count(_._2 == 0).toLong
      val nNew = xs.count(_._2 == 1).toLong
      val growth = if (nIdx == 0) None else Some(nNew * 1000000L / nIdx)
      val meanDot = if (nNew == 0) None else {
        val sum = xs.filter(_._2 == 1).map(_._1._2).sum
        Some(Math.floorDiv(sum, nNew))
      }
      bucket -> (nIdx, nNew, growth, meanDot)
    }
    val got = Similarity.ivfIncrementalIngest(spark, sf).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toMap
    assert(got == expected)
  }

  test("q159 clean conversions replay the pattern-with-negation rule") {
    import graft.operators.EventsOps
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "ts_ns DIV 1000 AS ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val expected = ev.filter(_._3 == "view").map { case (id, u, _, t) =>
      val after = byUser(u).filter(e => e._4 > t && e._4 <= t + EventsOps.PatternWindowUs)
      val p = after.filter(_._3 == "purchase").map(_._4).sorted.headOption.getOrElse(-1L)
      val e = after.filter(_._3 == "error").map(_._4).sorted.headOption.getOrElse(-1L)
      (u, id, t, p, e, p != -1L && (e == -1L || e > p))
    }.toSet
    val got = EventsOps.cleanConversions(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    assert(got === expected)
    assert(expected.count(_._6) > 0, "need clean conversions in fixture")
  }

  test("q159 boundary fixtures pin window edges and the negation rule") {
    import graft.operators.EventsOps
    import spark.implicits._
    val H = EventsOps.PatternWindowUs
    val ev = Seq(
      // u1: clean — purchase exactly at +window (inclusive); the error
      // past the window edge is invisible (sound: a disqualifying error
      // must precede an in-window purchase, so it is always in frame)
      (10L, 1L, "view", 1000L), (11L, 1L, "purchase", 1000L + H),
      (12L, 1L, "error", 1000L + H + 1L),
      // u2: DIRTY — error strictly between view and purchase
      (20L, 2L, "view", 1000L), (21L, 2L, "error", 2000L),
      (22L, 2L, "purchase", 3000L),
      // u3: no conversion — purchase 1µs past the window
      (30L, 3L, "view", 1000L), (31L, 3L, "purchase", 1001L + H),
      // u4: DIRTY — error at the purchase's exact microsecond (e <= p)
      (40L, 4L, "view", 1000L), (41L, 4L, "error", 5000L),
      (42L, 4L, "purchase", 5000L),
      // u5: clean — error BEFORE the view is out of frame
      (50L, 5L, "error", 500L), (51L, 5L, "view", 1000L),
      (52L, 5L, "purchase", 4000L),
      // u6: same-µs purchase as the view is NOT strictly after
      (60L, 6L, "view", 1000L), (61L, 6L, "purchase", 1000L))
      .toDF("event_id", "user_id", "event_type", "ts_us")
    val got = EventsOps.cleanConversionsFor(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toMap
    assert(got(1L) === ((1000L + H, -1L, true)))
    assert(got(2L) === ((3000L, 2000L, false)))
    assert(got(3L) === ((-1L, -1L, false)))
    assert(got(4L) === ((5000L, 5000L, false)))
    assert(got(5L) === ((4000L, -1L, true)))
    assert(got(6L) === ((-1L, -1L, false)))
  }

  test("q160 decayed activity replays the integer shift-decay") {
    import graft.operators.EventsOps
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "ts_ns DIV 1000 AS ts_us",
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = ev.map(_._2).max
    val step = 86400000000L * EventsOps.DecayHalfLifeDays
    val expected = ev.groupBy(_._1).map { case (u, es) =>
      u -> (es.size.toLong, es.map(_._3).sum,
        es.map { case (_, t, v) =>
          v >> math.min((ref - t) / step, 62L).toInt }.sum)
    }
    val got = EventsOps.decayedActivity(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
    // decay must bite: the decayed total is strictly below the raw total
    assert(got.values.map(_._3).sum < got.values.map(_._2).sum)
  }

  test("q164 transition rarity replays the integer markov contract") {
    import graft.operators.EventsOps
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts_ns DIV 1000 AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans: Seq[(Long, String, String)] =
      ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e._4, e._2)).map(_._3).toList.sliding(2)
          .collect { case List(a, b) => (u, a, b) }.toList
      }
    val total = trans.size.toLong
    val pPpm = trans.groupBy(t => (t._2, t._3))
      .map { case (k, xs) => k -> xs.size.toLong * 1000000L / total }
    val expected = trans.groupBy(_._1).map { case (u, xs) =>
      val raritySum = xs.map(t => 1000000L - pPpm((t._2, t._3))).sum
      u -> (xs.size.toLong, raritySum, raritySum / xs.size)
    }
    val got = EventsOps.transitionRarity(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expected)
  }

  test("q162 merge algebra certifies on a genuinely two-sided split") {
    import graft.operators.Incremental
    val rows = Incremental.aggMaintenance(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(7)), "every key must certify")
    // the split must be key-orthogonal: most cube keys need BOTH a base
    // and a delta contribution, or the min/max combine is never exercised
    val sides = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "ts_ns DIV 86400000000000 AS day",
        s"CAST(event_id % ${Incremental.DeltaMod} = 0 AS INT) AS is_delta")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("count(distinct is_delta)").as("ns"))
      .collect().map(_.getLong(2))
    assert(sides.count(_ == 2L) * 2 > sides.length,
      "most keys must carry base AND delta rows")
  }

  test("q226 centroid outliers: bottom-5% rank law per bucket") {
    val out = Similarity.centroidOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    // every flagged row satisfies the cut, and each bucket flags
    // exactly floor(n/20) rows (ranks 1..floor(n/20))
    assert(out.forall { case (_, _, _, rn, n) => rn * 20L <= n })
    out.groupBy(_._1).foreach { case (b, rows) =>
      val n = rows.head._5
      assert(rows.map(_._4).sorted.toSeq == (1 to (n / 20L).toInt),
        s"bucket $b rank set")
    }
    // flagged rows are genuinely the least-coherent: no flagged cos
    // exceeds any unflagged sibling's (they hold ranks from the bottom)
    val full = Similarity.assignedEmbeddings(spark, sf)
    assert(full.count() >= out.length)
  }

  test("q227 probe sweep: recall and candidates are monotone in nprobe") {
    val rows = Similarity.ivfProbeSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.SweepNprobes)
    assert(rows.forall { case (_, nq, _, rec, _) =>
      nq > 0 && rec >= 0 && rec <= 1000000 })
    val recs = rows.map(_._4); val cands = rows.map(_._5)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b },
      s"recall must not fall as nprobe grows: ${recs.toSeq}")
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b },
      s"candidates must not fall as nprobe grows: ${cands.toSeq}")
  }

  test("q228 band sweep: thresholds tighten monotonically") {
    val rows = Dedup.lshBandSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to graft.operators.Dedup.MinhashK / 2))
    // predicted set and true positives can only shrink as t grows;
    // tp is bounded by both sides; recall is non-increasing
    rows.foreach { case (_, nPred, tp, nTruth, _, _, _) =>
      assert(tp <= nPred && tp <= nTruth) }
    val preds = rows.map(_._2); val recalls = rows.map(_._6)
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b })
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
  }

  test("q232 budgeted sweep: same panel law on the fixed query set") {
    val rows = Similarity.ivfProbeSweepBudget(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Similarity.SweepNprobes)
    // the budget rule: queries are vec_id < 64, a fixed set at any SF
    assert(rows.forall(_._2 == rows.head._2) && rows.head._2 <= 64)
    val recs = rows.map(_._3); val cands = rows.map(_._4)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b })
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b })
  }

  test("q243 decontam sweep: one row per n, sane panel invariants") {
    val rows = TextOps.decontamSweep(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == TextOps.DecontamSweepNs)
    // the train universe is the same at every sweep point
    assert(rows.map(_._2).distinct.length == 1 && rows.head._2 > 0)
    rows.foreach { case (n, nTrain, nFlagged, ppm, chars, evGrams) =>
      assert(nFlagged >= 0 && nFlagged <= nTrain, s"n=$n")
      assert(ppm == nFlagged * 1000000L / nTrain)
      assert(chars >= 0 && evGrams > 0)
    }
    // the aggressiveness direction on this corpus: short grams collide
    // on the narrow vocabulary and over-flag relative to long grams
    assert(rows.head._3 >= rows.last._3,
      s"2-grams should flag at least as much as 5-grams: $rows")
  }

  test("q229 calibration: bin means sit inside their bins") {
    val rows = Similarity.knnCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lo, n, nc, acc, mean) =>
      assert(n > 0 && nc <= n)
      assert(acc == nc * 1000000L / n)
      assert(mean >= lo && mean < lo + 100000L, s"bin $lo mean $mean")
      assert(lo >= -1000000L && lo < 1000000L)
    }
  }
}
