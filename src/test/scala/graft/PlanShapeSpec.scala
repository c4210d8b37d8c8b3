package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational, Similarity}

/** Physical-plan shape assertions for the queries whose 100 TB viability
  * depends on the plan, not the output: the dedup candidate generators
  * must compile to bucket-local aggregation pipelines (no join of any
  * kind), star joins must broadcast every dimension, and ANN must
  * broadcast the query side instead of shuffling the corpus. Catching a
  * plan regression here is the point — q37's round-2 3.6× slowdown was
  * exactly such a shape change, invisible to the correctness oracle.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  private def assertNoJoin(p: String, label: String): Unit =
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "CartesianProduct", "BroadcastNestedLoopJoin").foreach { j =>
      assert(!p.contains(j), s"$label must not contain $j:\n${p.take(2000)}")
    }

  test("q37 ngram jaccard compiles to a join-free bucket pipeline") {
    val p = plan(Dedup.ngramJaccardPairs(spark, sf))
    assertNoJoin(p, "ngramJaccardPairs")
    // bucket window/agg + pair agg; window and groupBy share the
    // (source, shash) partitioning so the keys shuffle once each
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q39 lsh candidates compile to a join-free band-bucket pipeline") {
    val p = plan(Dedup.lshCandidatePairs(spark, sf))
    assertNoJoin(p, "lshCandidatePairs")
    // signature agg (doc_id) + band window/agg (band key) + pair agg
    assert(shuffles(p) <= 3, s"expected ≤3 shuffles:\n${p.take(2000)}")
  }

  test("q04 star join broadcasts every dimension, single agg shuffle") {
    val p = plan(Relational.regionRevenue(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"dimensions must broadcast, not shuffle:\n${p.take(2000)}")
    assert(shuffles(p) <= 1, s"only the final aggregation may shuffle:\n${p.take(2000)}")
  }

  test("q41 brute-force knn broadcasts queries; corpus is never shuffled") {
    val p = plan(Similarity.bruteForceKnn(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must not shuffle for the join:\n${p.take(2000)}")
    // the only hash shuffle is the per-query top-k window
    assert(shuffles(p) <= 1, s"expected ≤1 shuffle (rank window):\n${p.take(2000)}")
  }

  test("q52 bucketed near-dup pairs via a bucket equi-join, never a data×data loop") {
    val p = plan(Dedup.embeddingNearDupBucketed(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the pair-generating join must be an equi-join keyed on the bucket
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[bucket".r
      .findFirstIn(p).isDefined,
      s"pair join must key on bucket:\n${p.take(2000)}")
    // IVF assignment is a pure projection (argmax over centroid
    // literals) — no nested-loop join anywhere, and only the bucket-cap
    // window + pair-join shuffles remain
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"assignment must be map-only, not a join:\n${p.take(2000)}")
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q42 ivf knn: map-only assignment+probes, corpus never shuffled") {
    val p = plan(Similarity.ivfKnn(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus must meet only the broadcast probe join:\n${p.take(2000)}")
    // the single shuffle is the per-query top-k window
    assert(shuffles(p) <= 1, s"expected ≤1 shuffle (rank window):\n${p.take(2000)}")
  }

  test("ivf assignment stays map-only at any index width (derived nlist)") {
    // nlistFor grows the index ∝ √N; the assignment must stay a pure
    // projection (centroid literals in codegen) no matter how wide —
    // widening may never introduce a join or a shuffle
    for (nlist <- Seq(16, 64)) {
      val p = plan(Similarity.assignedEmbeddingsFor(spark, sf, nlist))
      assertNoJoin(p, s"assignedEmbeddingsFor(nlist=$nlist)")
      assert(shuffles(p) == 0,
        s"assignment at nlist=$nlist must not shuffle:\n${p.take(2000)}")
    }
    assert(Similarity.nlistFor(100) == 16, "floor holds for small corpora")
    assert(Similarity.nlistFor(1000000) == 1000, "nlist ~ sqrt(N)")
  }

  test("q81 pq code assignment is a map-only projection") {
    val p = plan(Similarity.pqCodes(spark, sf))
    assertNoJoin(p, "pqCodes")
    assert(shuffles(p) == 0,
      s"PQ assignment must not shuffle:\n${p.take(2000)}")
  }

  test("pq code assignment stays map-only at any codebook width (derived k)") {
    // pqKFor grows the codebook ∝ √N to keep the q88 band key space
    // ahead of the corpus; widening may never introduce a join/shuffle
    for (k <- Seq(16, 48)) {
      val p = plan(Similarity.pqCodesFor(spark, sf, k))
      assertNoJoin(p, s"pqCodesFor(k=$k)")
      assert(shuffles(p) == 0,
        s"code assignment at k=$k must not shuffle:\n${p.take(2000)}")
    }
    assert(Similarity.pqKFor(1000) == 16, "floor holds for small corpora")
    assert(Similarity.pqKFor(4000000) == 1000, "k ~ sqrt(N/4)")
  }

  test("q106 derived-width ivf search keeps the q42 plan shape") {
    // the production knobs (nlist=√N, nprobe=√nlist) must not change
    // the plan: map-only assignment + broadcast probe join + one top-k
    // window shuffle, same as the pinned graded query
    val p = plan(Similarity.ivfKnnAuto(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus must meet only the broadcast probe join:\n${p.take(2000)}")
    assert(shuffles(p) <= 1, s"expected ≤1 shuffle (rank window):\n${p.take(2000)}")
  }

  test("q108 derived-width ivf-pq search keeps the q83 plan shape") {
    val p = plan(Similarity.ivfPqSearchAuto(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"the coded corpus must never shuffle for the join:\n${p.take(2000)}")
    assert(shuffles(p) <= 1, s"expected ≤1 shuffle:\n${p.take(2000)}")
  }

  test("q109 kmeans training round: map-only assignment, O(k·d) shuffle, model broadcast") {
    val p = plan(Similarity.kmeansTrain(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"only the k×d previous-model relation may join (broadcast):\n${p.take(2000)}")
    // (bucket, pos) mean aggregation + final bucket rollup
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q107 derived-k pq histogram: map-only codes + one aggregation shuffle") {
    val p = plan(Similarity.pqDerivedCodeHistogram(spark, sf))
    assertNoJoin(p, "pqDerivedCodeHistogram")
    assert(shuffles(p) <= 1,
      s"expected ≤1 shuffle (subspace/code agg):\n${p.take(2000)}")
  }

  test("q82 dup-span profile: window + agg, join-free, two shuffles") {
    val p = plan(Dedup.dupSpanProfile(spark, sf))
    assertNoJoin(p, "dupSpanProfile")
    // shash window partitioning + doc_id aggregation
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q83 ivf-pq search: coded corpus never shuffles, probes broadcast") {
    val p = plan(Similarity.ivfPqSearch(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"probe side must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"the coded corpus must never shuffle for the join:\n${p.take(2000)}")
    // the only hash shuffle is the per-query top-k window
    assert(shuffles(p) <= 1, s"expected ≤1 shuffle:\n${p.take(2000)}")
  }

  test("q84 decontaminate: eval side broadcasts, train side shuffles once") {
    val p = plan(graft.operators.TextOps.decontaminateTrain(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"eval fingerprints must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the train corpus must never shuffle for the join:\n${p.take(2000)}")
    // eval-distinct shuffle + per-doc aggregation shuffle
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q85 token rarity: window + agg with a broadcast grand total") {
    val p = plan(graft.operators.TextOps.tokenRarityScore(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-sized shuffle join:\n${p.take(2000)}")
    // token window partitioning + doc aggregation; the 1-row grand
    // total rides a broadcast nested loop
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q86 shard balance: one 64-group aggregation, broadcast total") {
    val p = plan(graft.operators.Sampling.shardBalance(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffle join:\n${p.take(2000)}")
    assert(shuffles(p) <= 1, s"only the shard aggregation may shuffle:\n${p.take(2000)}")
  }

  test("q87 dup-span scrub: window + distinct-count, join-free") {
    val p = plan(Dedup.dupSpanScrub(spark, sf))
    assertNoJoin(p, "dupSpanScrub")
    // shash window + the two-phase distinct count on (doc_id, tp)
    assert(shuffles(p) <= 3, s"expected ≤3 shuffles:\n${p.take(2000)}")
  }

  test("q88 pq-lsh pairs: join-free capped band pipeline over codes") {
    val p = plan(Similarity.pqLshPairs(spark, sf))
    assertNoJoin(p, "pqLshPairs")
    // band window/agg + pair agg on top of the map-only code projection
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q89 incremental lsh: join-free, one signature agg + band window + pair agg") {
    val p = plan(Dedup.incrementalLshPairs(spark, sf))
    assertNoJoin(p, "incrementalLshPairs")
    // signature agg (doc_id) + per-side band window/agg + pair agg
    assert(shuffles(p) <= 3, s"expected ≤3 shuffles:\n${p.take(2000)}")
  }

  test("q93 semantic agreement: pairs broadcast, corpus never shuffles for the join") {
    val p = plan(Similarity.lexicalSemanticAgreement(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"the capped pair list must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"embeddings must never shuffle for the join:\n${p.take(2000)}")
  }

  test("q94 token budget: the only ordered single-partition work is the bucket sweep") {
    val p = plan(graft.operators.Sampling.tokenBudgetSelect(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the corpus is never range-partitioned (no global sort of documents);
    // single-partition exchanges exist only for the bucket sweep and the
    // 1-row scalar totals, and the sweep's sort keys the BUCKET relation
    assert(!p.contains("Exchange rangepartitioning"),
      s"corpus must not be globally sorted:\n${p.take(2000)}")
    assert(p.contains("Sort [score_bucket"),
      s"the bucket sweep sort must exist:\n${p.take(2000)}")
    // every sort is partition-local (", false, 0"): the rarity window's
    // token sort spills per partition, the sweep sorts the bucket
    // relation — nothing sorts the corpus globally
    assert(!"Sort \\[[^\\]]*\\], true, 0".r.findFirstIn(p).isDefined,
      s"no global sort may appear:\n${p.take(2000)}")
  }

  test("q97/q98 event analytics join on user keys, never cartesian") {
    Seq(
      "funnel" -> graft.operators.EventsOps.funnelStages(spark, sf),
      "cohorts" -> graft.operators.EventsOps.retentionCohorts(spark, sf)
    ).foreach { case (label, df) =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$label:\n${p.take(2000)}")
      // the 1-row total rides a broadcast; real joins are keyed
      assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"), s"$label must join keyed:\n${p.take(2000)}")
    }
  }

  test("q101 cube plans one Expand with a single aggregation shuffle") {
    val p = plan(Relational.cubePricing(spark, sf))
    assert(p.contains("Expand"), s"grouping sets need Expand:\n${p.take(2000)}")
    assert(shuffles(p) <= 1, s"one agg shuffle:\n${p.take(2000)}")
    assertNoJoin(p, "cubePricing")
  }

  test("q102 ntile plans one window shuffle, no join") {
    val p = plan(Relational.ntileBalanceQuartiles(spark, sf))
    assertNoJoin(p, "ntileBalanceQuartiles")
    assert(shuffles(p) <= 2, s"window + agg may shuffle:\n${p.take(2000)}")
  }

  test("q100 gopher gates join doc-keyed, never cartesian") {
    val p = plan(graft.operators.CorpusPrep.gopherGates(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q104/q105 pair consumers broadcast the capped pair list, never cartesian") {
    val p = plan(Dedup.crossSourceDupMatrix(spark, sf))
    // BOTH corpus-scan joins must ride a broadcast of the capped pair
    // list (losing one silently turns a map-side join into a corpus
    // shuffle — seen as a >2× q104 bench outlier in round 8; lock it
    // here so the regression fails the build, not the bench)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"crossSourceDupMatrix: both pair-list joins must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"crossSourceDupMatrix: the corpus must never shuffle for the join:\n${p.take(2000)}")
    // q105 carries the 32-bit signature through the capped bucket
    // emission, so the exact-hamming step needs NO join back to the
    // signature relation — the whole pipeline is keyed shuffles only
    val p105 = plan(Dedup.simhashPairs(spark, sf))
    assertNoJoin(p105, "simhashPairs")
    assert(shuffles(p105) <= 4,
      s"simhashPairs: expected ≤4 keyed shuffles:\n${p105.take(2000)}")
  }

  test("q136/q138 leakage matrices broadcast the pair list into both label scans") {
    for ((label, df) <- Seq(
        "splitLeakageMatrix" -> Dedup.splitLeakageMatrix(spark, sf),
        "semanticSplitLeakageMatrix" -> Dedup.semanticSplitLeakageMatrix(spark, sf))) {
      val p = plan(df)
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
        s"$label: both pair-list joins must broadcast:\n${p.take(2000)}")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
        !p.contains("CartesianProduct"),
        s"$label: the corpus must never shuffle for the join:\n${p.take(2000)}")
    }
  }

  test("q134 byte histogram is map-only: no join, no shuffle, bytes stay in partition") {
    val p = plan(graft.multimodal.Multimodal.mediaByteHistogram(spark, sf))
    assertNoJoin(p, "mediaByteHistogram")
    assert(shuffles(p) == 0 && !p.contains("Exchange"),
      s"feature extraction must never move the payload bytes:\n${p.take(2000)}")
  }

  test("q103 session conversion shuffles on the user key only") {
    val p = plan(graft.operators.AsOf.sessionConversion(spark, sf))
    assertNoJoin(p, "sessionConversion")
    // user-keyed window+agg, then the tiny day rollup
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q110 binned range join plans as an equi-join, never nested-loop") {
    val p = plan(graft.operators.AsOf.openSessionsAtPurchase(spark, sf))
    // the whole point of the bin key: Spark would plan raw
    // ts BETWEEN start AND end as BroadcastNestedLoopJoin (small data)
    // or CartesianProduct (large) — both undistributable at scale
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on the bin key:\n${p.take(2000)}")
    assert(p.contains("Join"), s"bin equi-join expected:\n${p.take(2000)}")
  }

  test("q111 salted join is a hash equi-join on (key, salt), never nested-loop") {
    val p = plan(graft.operators.SkewJoin.saltedSegmentRevenue(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"salted join must remain an equi-join:\n${p.take(2000)}")
    // the dim side explodes salt-ways (Generate) before the join
    assert(p.contains("Generate explode"), s"salt explode expected:\n${p.take(2000)}")
  }

  test("q112 scd intervals shuffle on user-derived keys only, no join") {
    val p = plan(graft.operators.EventsOps.scdIntervals(spark, sf))
    assertNoJoin(p, "scdIntervals")
    // user window → (user, version) collapse → user window: three keyed
    // shuffles of strictly shrinking data, never a global one
    assert(shuffles(p) <= 3, s"expected ≤3 keyed shuffles:\n${p.take(2000)}")
    assert(!p.contains("Sort [") || !p.contains(", true, 0"),
      s"no global sort:\n${p.take(2000)}")
  }

  test("q113 grouping sets plan one Expand with a single aggregation shuffle") {
    val p = plan(Relational.groupingSetsPricing(spark, sf))
    assert(p.contains("Expand"), s"grouping sets need Expand:\n${p.take(2000)}")
    assert(shuffles(p) <= 1, s"one agg shuffle:\n${p.take(2000)}")
    assertNoJoin(p, "groupingSetsPricing")
  }

  test("q115 session paths shuffle on user-derived keys only, no join") {
    val p = plan(graft.operators.AsOf.sessionPaths(spark, sf))
    assertNoJoin(p, "sessionPaths")
    // user window → session window/collapse → tiny path rollup
    assert(shuffles(p) <= 3, s"expected ≤3 keyed shuffles:\n${p.take(2000)}")
  }

  test("q116 revenue share broadcasts dims; window runs over the aggregate") {
    val p = plan(Relational.regionRevenueShare(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"dimensions must broadcast:\n${p.take(2000)}")
    // fact agg shuffle + the ~25-row region window
    assert(shuffles(p) <= 2, s"expected agg + window shuffles only:\n${p.take(2000)}")
  }

  test("q118 hard negatives broadcast queries; corpus never shuffles for the join") {
    val p = plan(Similarity.hardNegativeMining(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus must not shuffle for the join:\n${p.take(2000)}")
  }

  test("q120 ivf mining keeps the q42 shape: probes broadcast, corpus never shuffles") {
    val p = plan(Similarity.ivfHardNegativeMining(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"probe side must broadcast onto the bucket key:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"corpus must not shuffle for the join:\n${p.take(2000)}")
  }

  test("q123 topk aggregate plans a partial/final ObjectHashAggregate pair") {
    val p = plan(Similarity.bruteForceKnnAgg(spark, sf))
    // the point of the aggregate: candidates prune to k per query per
    // map task BEFORE the exchange — window top-k would shuffle them all
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"partial + final aggregate expected:\n${p.take(2000)}")
    assert(p.contains("partial_graft_topk") || p.contains("partial_boundedtopk") ||
      p.contains("Partial"), s"map-side partial phase expected:\n${p.take(2000)}")
    assert(!p.contains("Window"), s"no window sort:\n${p.take(2000)}")
  }

  test("q117 interval overlap plans as an equi-join, never nested-loop") {
    val p = plan(graft.operators.AsOf.sessionOverlapMatrix(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap join must stay an equi-join on the bin key:\n${p.take(2000)}")
    assert(p.contains("Join"), s"bin equi-join expected:\n${p.take(2000)}")
  }

  test("runtime bloom filter injects into a selective fact-dim shuffle join") {
    // the 100 TB lever the plan-shape suite otherwise can't see: when a
    // dim side is filtered selectively and the fact side shuffles, Spark
    // builds a bloom filter over the dim keys and pushes a might_contain
    // probe into the fact scan — rows for absent keys never reach the
    // exchange. Thresholds are sized for production scans, so the test
    // lowers the application-side floor to observe the mechanism at sf
    // scale; a `def` plan per conf flip (QueryExecution caches).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def joined = {
        val orders = graft.sources.Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT")
        graft.sources.Tables.lineitem(spark, sf)
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      }
      val p = plan(joined)
      assert(p.contains("bloom_filter_agg"),
        s"dim side must build the runtime bloom filter:\n${p.take(2000)}")
      assert(p.toLowerCase.contains("might_contain"),
        s"fact side must probe it before the exchange:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q125 capped overlap: rank-capped codegen merge join, no array pairing") {
    // round-10 shape: the cap is a rank window (≤ cap survivors per
    // bin), pairing is a codegen merge join on the bin equi-key — the
    // round-9 collect_list + interpreted array-lambda bucket cost 1.4×
    // the uncapped twin even with the cap dormant, and is banned here.
    val df = graft.operators.AsOf.sessionOverlapMatrixCapped(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairing must stay on the bin equi-key:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"), s"pairs must merge-join:\n${p.take(2000)}")
    // the ranked relation is the full bin-bounded data — broadcast
    // would be wrong at scale and recomputes the upstream to boot
    assert(!p.contains("BroadcastHashJoin"),
      s"full-data side must not broadcast:\n${p.take(2000)}")
    assert(p.contains("row_number"), s"cap must rank by id:\n${p.take(2000)}")
    assert(!p.contains("collect_list"),
      s"no array pairing — that is the dormant-cap overhead:\n${p.take(2000)}")
    // both join sides are canonically identical below the bin exchange —
    // AQE must materialize that shuffle once and reuse it, or the join
    // pays 2× upstream compute
    df.collect() // finalize THIS QueryExecution's adaptive plan (a
    // write/count action would plan a fresh QueryExecution instead)
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"), fin.take(500))
    assert(fin.contains("ReusedExchange") || fin.contains("ReusedQueryStage"),
      s"bin exchange must be reused across the join sides:\n${fin.take(3000)}")
  }

  test("q140 endgame ledger: tiny sets broadcast, corpus never cartesians") {
    val p = plan(graft.operators.CurationPipeline.endgameLedger(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"composed chain must stay equi-keyed:\n${p.take(2000)}")
    // single-row scalar attaches (each constituent pipeline's `grand`
    // aggregate) plan as BroadcastNestedLoopJoin BuildRight Cross by
    // design; what the lock bans is a CONDITIONED nested loop — a theta
    // join over two data-sized sides
    "BroadcastNestedLoopJoin.*".r.findAllIn(p).foreach { m =>
      assert(m.contains("BuildRight, Cross"),
        s"only broadcast scalar cross attaches may nested-loop: $m")
    }
    // the removal set and the kept-bucket relation are cluster/bucket
    // sized — they must reach the corpus as broadcasts, never shuffles
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"removed + keptBuckets must broadcast:\n${p.take(2000)}")
  }

  test("q141 denylist scrub: one scan, membership in the row predicate, one rollup shuffle") {
    val p = plan(graft.operators.TextOps.denylistScrub(spark, sf))
    assertNoJoin(p, "denylistScrub")
    assert(shuffles(p) <= 1, s"only the rollup may shuffle:\n${p.take(2000)}")
  }

  test("q143 ks drift: cardinality-bounded counts, shared type partitioning, no join") {
    val p = plan(graft.operators.EventsOps.valueDriftKs(spark, sf))
    assertNoJoin(p, "valueDriftKs")
    // count agg on (type, cents) + one window exchange on type; the
    // final per-type max reuses the window partitioning
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q126 media decode never shuffles: generation and parse are map-only") {
    val media = graft.multimodal.Multimodal.mediaBytesFromDocuments(spark, sf)
    val p = plan(graft.multimodal.Multimodal.decodeMedia(media))
    assertNoJoin(p, "decodeMedia")
    assert(shuffles(p) == 0, s"decode must be a pure scan pipeline:\n${p.take(2000)}")
  }

  test("q03 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.topkOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q62 containment pairs compile to a join-free bucket pipeline") {
    val p = plan(Dedup.containmentPairs(spark, sf))
    assertNoJoin(p, "containmentPairs")
    // shares q37's capped shingle-intersection pipeline: bucket
    // window/agg on (source, shash) + pair agg
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q60 curation pipeline is two shuffles end-to-end") {
    val p = plan(graft.operators.CurationPipeline.curationSummary(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // shuffle 1: the fingerprint groupBy (keeper selection); shuffle 2:
    // the (split, lang) rollup. The keeper join itself broadcasts —
    // keepers is an aggregate of 16-byte fps, small relative to docs
    assert(p.contains("BroadcastHashJoin"),
      s"keeper join must broadcast:\n${p.take(2000)}")
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q64 winnow overlap compiles to a join-free bucket pipeline") {
    val p = plan(graft.operators.TextOps.winnowOverlapPairs(spark, sf))
    assertNoJoin(p, "winnowOverlapPairs")
    // (source, fp) bucket window/agg share one shuffle + pair agg
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q66 repetition profile is one explode + two agg shuffles, no join") {
    val p = plan(graft.operators.CorpusPrep.repetitionProfile(spark, sf))
    assertNoJoin(p, "repetitionProfile")
    // (doc_id, kind, v) agg then doc_id agg
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q68 sequence packing is a single per-source window shuffle") {
    val p = plan(graft.operators.CorpusPrep.sequencePacking(spark, sf))
    assertNoJoin(p, "sequencePacking")
    assert(shuffles(p) <= 1, s"expected ≤1 shuffle (source window):\n${p.take(2000)}")
    assert(!p.contains("Exchange SinglePartition") &&
      !p.contains("Exchange rangepartitioning"),
      s"packing must not globally sort or single-partition:\n${p.take(2000)}")
  }

  test("q74 bloom prefilter gates the anti-join probe side") {
    val p = plan(graft.operators.Sketches.bloomPrefilterDedup(spark, sf))
    assert(p.contains("might_contain"),
      s"batch side must probe the bloom filter before the join:\n${p.take(2000)}")
    assert(p.contains("LeftAnti"), s"exact confirm must be an anti-join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // corpus fp distinct + final keep-first agg (+ one more if AQE
    // splits the anti-join); never a per-pair structure
    assert(shuffles(p) <= 3, s"expected ≤3 shuffles:\n${p.take(2000)}")
  }

  test("q76 lloyd step: broadcast seed join, O(k·d) agg shuffles only") {
    val p = plan(Similarity.kmeansRefine(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // (bucket, pos) partial agg + bucket rollup — assignment itself is
    // a map-only projection, so nothing else may shuffle
    assert(shuffles(p) <= 2, s"expected ≤2 shuffles:\n${p.take(2000)}")
  }

  test("q78 contamination compiles to the incremental-dedup shape") {
    val p = plan(graft.operators.TextOps.contaminationCheck(spark, sf))
    assert(p.contains("LeftSemi"),
      s"train membership must be a semi-join:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // train fp distinct + per-doc rollup; never doc×doc
    assert(shuffles(p) <= 3, s"expected ≤3 shuffles:\n${p.take(2000)}")
    // Catalyst's InferFiltersFromGenerate re-derives a size(winnow)>0
    // guard on the test side (extra winnow evals); conjunct order must
    // lead with the cheap bucket predicate so that guard only ever runs
    // on the 10% test split
    assert("Filter \\(+md5prefixlong".r.findFirstIn(p).isDefined,
      s"pushed filters must lead with the bucket predicate:\n${p.take(3000)}")
  }

  test("q55 checked profile avoids the Expand multi-distinct plan") {
    val p = plan(graft.operators.Profiler.cardinalityProfileChecked(
      spark, sf, "orders"))
    assert(!p.contains("Expand"),
      s"exact NDV must use the narrow pair pipeline, not Expand:\n${p.take(2000)}")
  }

  test("q144 pii scrub: derive/count/redact fuse into the scan, one rollup shuffle") {
    val p = plan(graft.operators.TextOps.piiRedactionReport(spark, sf))
    assertNoJoin(p, "piiRedactionReport")
    assert(shuffles(p) <= 1, s"only the segment rollup may shuffle:\n${p.take(2000)}")
  }

  test("q145 edit verify broadcasts the pair list into both text lookups") {
    val p = plan(Dedup.lshEditVerify(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both pair-list joins must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"the corpus must never shuffle for the verification join:\n${p.take(2000)}")
  }

  test("q146 mad outliers: order statistics run over the count relation only") {
    val p = plan(graft.operators.EventsOps.valueOutliersMad(spark, sf))
    // per-type med/mad relations attach via broadcast — the corpus-sized
    // count relation is never shuffled for a join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"stat lookups must broadcast:\n${p.take(2000)}")
  }

  test("q148 layout audit: bounds broadcast, one scan, keyed chunk shuffles only") {
    val p = plan(graft.lake.ZOrder.layoutAudit(spark, sf))
    // the 1-row bounds relation and the 32-row probe relation attach via
    // broadcast; the fact is never shuffled for a join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"fact must never shuffle for a join:\n${p.take(2000)}")
    // chunk-stats agg + the distinct-and-sum rollup over the
    // metadata-sized chunk relation
    assert(shuffles(p) <= 3, s"expected ≤3 keyed shuffles:\n${p.take(2000)}")
  }

  test("q154 pagerank: every per-iteration rank join broadcasts; edges never merge-join") {
    // materialize=false exposes the full iteration plan (the production
    // form checkpoints the result, which collapses the visible plan)
    val p = plan(graft.operators.GraphOps.pagerank(
      graft.operators.GraphOps.tradeEdges(spark, sf), materialize = false))
    // the edge relation is persisted and re-read per iteration; ranks
    // and out-degrees are node-sized and attach via broadcast — a
    // SortMergeJoin anywhere means an iteration started shuffling the
    // edge relation
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"rank joins must broadcast:\n${p.take(2000)}")
    assert(p.contains("InMemoryTableScan"),
      s"edge relation must iterate from the cache:\n${p.take(2000)}")
  }

  test("q154 pagerank over the broadcast limit: rank joins merge, never broadcast") {
    // broadcastNodeLimit=0 is the >50M-node posture: an unconditional
    // broadcast of a ~10⁹-row rank relation OOMs the driver, so every
    // per-iteration join must be a SortMergeJoin against the cached
    // edge relation — no broadcast of ranks anywhere. Cache lookup
    // canonicalizes hints away, so the broadcast-mode test above would
    // otherwise satisfy this plan's edge relation from ITS cache —
    // clear it so the over-limit plan is built from scratch.
    spark.catalog.clearCache()
    val p = plan(graft.operators.GraphOps.pagerank(
      graft.operators.GraphOps.tradeEdges(spark, sf), materialize = false,
      broadcastNodeLimit = Some(0L)))
    // the rank loop's joins all key on src/node; the upstream edge-BUILD
    // join (lineitem⋈orders, keyed on orderkey) may broadcast by stats
    // at test scale — it runs once, outside the guarded loop
    assert("BroadcastHashJoin \\[(src|node)#".r.findFirstIn(p).isEmpty,
      s"over-limit graph must not broadcast ranks/out-degrees:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"),
      s"over-limit rank joins must sort-merge:\n${p.take(2000)}")
    assert(p.contains("InMemoryTableScan"),
      s"edge relation must iterate from the cache:\n${p.take(2000)}")
  }

  test("q155 stratified alloc: allocation attaches via broadcast, doc window is stratum-keyed") {
    val p = plan(graft.operators.Sampling.stratifiedAlloc(spark, sf))
    // the strata-sized allocation table must broadcast into the ranked
    // doc relation (both attach points)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"allocation joins must broadcast:\n${p.take(2000)}")
    // the doc-side rank window partitions by stratum — the only
    // single-partition windows run over the strata-sized relation
    assert(p.contains("row_number"),
      s"expected the rank window:\n${p.take(2000)}")
  }

  test("q157 lexical topk: keyed posting joins only; bounded topk aggregate") {
    val p = plan(graft.operators.Retrieval.lexicalTopK(spark, sf))
    // posting ⋈ posting is equi-keyed on the shingle hash; the only
    // nested-loop is the 1-row corpus-count broadcast (the q148 bounds
    // pattern) — doc × doc never materializes as a cartesian
    assert(!p.contains("CartesianProduct"),
      s"posting joins must be equi-keyed:\n${p.take(2000)}")
    // ≤2: the posting subtree (with its 1-row attach) appears on both
    // sides of the candidate join in the printed tree
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2,
      s"only the 1-row count attach may nested-loop:\n${p.take(2000)}")
    // per-query selection runs through the bounded graft_topk aggregate
    // (ObjectHashAggregate), not a window sort
    assert(p.contains("graft_topk"),
      s"expected the bounded top-k aggregate:\n${p.take(2000)}")
  }

  test("q164 transition rarity: one user-keyed window, model attaches via broadcast") {
    val p = plan(graft.operators.EventsOps.transitionRarity(spark, sf))
    // the type²-sized transition model (and its 1-row total) broadcast
    // back into the transition relation — the events never re-shuffle
    // for the model join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"model must broadcast:\n${p.take(2000)}")
    assert(p.contains("lag("), s"expected the sequence window:\n${p.take(2000)}")
  }

  test("q166 collocations: vocabulary-bounded joins broadcast; no cartesian pairing") {
    val p = plan(graft.operators.CorpusPrep.collocations(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"unigram counts must broadcast into the bigram relation:\n${p.take(2000)}")
  }

  test("q169 privacy audit: two QI-keyed agg pipelines, no join") {
    val p = plan(graft.quality.PrivacyAudit.kAnonymityAudit(spark, sf))
    assertNoJoin(p, "kAnonymityAudit")
  }

  test("q170 char LM: alphabet-bounded model joins broadcast") {
    val p = plan(graft.operators.TextOps.charBigramNll(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"bigram model and prefix totals must broadcast:\n${p.take(2000)}")
  }

  test("q171 adaptive floor: floor relation broadcasts back onto scores") {
    val p = plan(graft.operators.CorpusPrep.adaptiveQualityFloor(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"per-source floor must broadcast:\n${p.take(2000)}")
  }

  test("q174 BPE merges: vocab-bounded rounds; pair relation never shuffles a join") {
    val p = plan(graft.operators.CorpusPrep.bpeTrainMerges(spark, sf))
    // each round's only joins are 1-row broadcast cross joins (the top
    // pair and the stats rollup); the symbol relation itself must never
    // merge- or hash-shuffle-join
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"only broadcast joins allowed:\n${p.take(2000)}")
  }

  test("q175 covariance sums: ONE explode→combine pass, flat longs") {
    val p = plan(Similarity.embeddingCovarianceSums(spark, sf))
    // Gram pairs, per-dim sums and the count row ride one explode of
    // PRIMITIVE longs — a single corpus scan and one dimension-bounded
    // shuffle; the only join is the post-aggregation pos→(i,j) decode
    // against the 2,145-row broadcast map (never corpus-sized, never
    // shuffled)
    Seq("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
      "BroadcastNestedLoopJoin").foreach { j =>
      assert(!p.contains(j), s"covariance must not contain $j:\n${p.take(2000)}")
    }
    assert(shuffles(p) <= 1, s"expected one shuffle:\n${p.take(2000)}")
    assert("Scan parquet".r.findAllIn(p).length <= 1,
      s"corpus must be scanned once:\n${p.take(2000)}")
    // the exploded element must be a primitive, not a struct: a struct
    // element would put 2,145 allocations back on every corpus row
    assert(!p.contains("named_struct"),
      s"exploded element must be a flat long:\n${p.take(2000)}")
  }

  test("q176 triangles: every join is keyed or a 1-row broadcast — no cartesian") {
    // materialize=false exposes the full motif plan (the production form
    // checkpoints the result, which collapses the visible plan)
    val p = plan(graft.operators.GraphOps.supplierTrianglesFor(
      graft.sources.Tables.lineitem(spark, sf), materialize = false))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the only nested-loop joins are the 1-row threshold/stat
    // broadcasts (Cross); a data-sized nested loop would be Inner
    assert(!"BroadcastNestedLoopJoin BuildRight, Inner".r.findFirstIn(p).isDefined,
      s"no data-sized nested-loop join:\n${p.take(2000)}")
  }

  /** Builds `df`'s plan with stats-based auto-broadcast disabled, so any
    * BroadcastHashJoin left in it can only come from an explicit
    * `broadcast()` hint — isolating exactly what the over-limit guard
    * must remove (a stats decision would never broadcast a 10⁹-row node
    * relation; an unconditional hint would).
    */
  private def planNoAutoBroadcast(df: => DataFrame): String = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try plan(df) finally spark.conf.set(key, saved)
  }

  test("q176 triangles over the broadcast limit: degrees never ride a hinted broadcast") {
    // broadcastNodeLimit=0 is the >50M-node posture: the node-sized
    // degree relation must attach via sort-merge, not a driver-hashed
    // broadcast (the q154 guard, extended family-wide)
    val p = planNoAutoBroadcast(graft.operators.GraphOps.supplierTrianglesFor(
      graft.sources.Tables.lineitem(spark, sf), materialize = false,
      broadcastNodeLimit = Some(0L)))
    assert(!p.contains("BroadcastHashJoin"),
      s"over-limit motif count must not hint-broadcast degrees:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"),
      s"over-limit degree joins must sort-merge:\n${p.take(2000)}")
  }

  test("q179 CUSUM: one fact aggregation; windows run on the day relation") {
    val p = plan(graft.operators.StatsAudit.revenueCusum(spark, sf))
    assertNoJoin(p, "revenueCusum")
    // fact scan → daily agg (1 shuffle) → single-partition windows
    // over the day-bounded relation
    assert(shuffles(p) <= 1, s"expected one aggregation shuffle:\n${p.take(2000)}")
  }

  test("q180 Benford: digit agg + 9-row broadcasts only") {
    val p = plan(graft.operators.StatsAudit.benfordAudit(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"),
      s"expectation table and total must broadcast:\n${p.take(2000)}")
  }

  test("q183 frequent pairs: join-free basket explode + one pair aggregation") {
    val p = plan(graft.operators.Association.frequentPairs(spark, sf))
    assertNoJoin(p, "frequentPairs")
    // basket agg + pair agg: two keyed shuffles, no all-pairs join
    assert(shuffles(p) <= 2, s"expected basket+pair shuffles only:\n${p.take(2000)}")
  }

  test("q184 rules: item-support joins are keyed; only the 1-row total broadcasts") {
    val p = plan(graft.operators.Association.associationRules(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the part-dimension item relation must never nested-loop against
    // the rules (only the 1-row basket total rides a Cross broadcast)
    assert(!"BroadcastNestedLoopJoin BuildRight, Inner".r.findFirstIn(p).isDefined,
      s"no data-sized nested-loop join:\n${p.take(2000)}")
  }

  test("q185 OLS trend: keyed customer join, regression algebra on the month relation") {
    val p = plan(graft.operators.StatsAudit.revenueTrend(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // fact→customer equi-join + two aggregations; no corpus-scale window
    assert(!p.contains("Window"), s"no window over facts:\n${p.take(2000)}")
  }

  test("q205 per-group top-k: the bounded heap replaces the window sort") {
    val p = plan(graft.operators.Relational.topCustomersPerNation(spark, sf))
    assert(!p.contains("Window"), s"no window operator:\n${p.take(2000)}")
    // the heap aggregate must run with a partial (map-side) phase
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed-imperative aggregate expected:\n${p.take(2000)}")
  }

  test("q190 PIT enrichment: one user-keyed window, no join") {
    val p = plan(graft.operators.EventsOps.pitEnrichment(spark, sf))
    assertNoJoin(p, "pitEnrichment")
  }

  test("q203 bootstrap: fact agg once, explode on the day relation") {
    val p = plan(graft.operators.StatsAudit.bootstrapMeans(spark, sf))
    assertNoJoin(p, "bootstrapMeans")
    assert("Scan parquet".r.findAllIn(p).length <= 1,
      s"facts scanned once:\n${p.take(2000)}")
  }

  test("q173 JL projection is a pure map — no join, no shuffle") {
    val p = plan(Similarity.jlProjectionChecksums(spark, sf))
    assertNoJoin(p, "jlProjectionChecksums")
    assert(shuffles(p) == 0, s"expected map-only plan:\n${p.take(2000)}")
  }

  test("q208 boilerplate density: keyed equi-join on shash, no corpus window") {
    val p = plan(graft.operators.TextOps.boilerplateDensity(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the df rejoin is an EQUI-join keyed on shash; at tiny SFs the
    // stats-estimated df aggregate legitimately broadcasts — at scale
    // the estimate tracks the corpus and the same plan merges — what
    // must never appear is an unkeyed pairing or a corpus window
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[shash".r
      .findFirstIn(p).isDefined,
      s"df rejoin must be keyed on shash:\n${p.take(2000)}")
    assert(!p.contains("Window"), s"no corpus window:\n${p.take(2000)}")
  }

  test("q210 rolling actives: constant-bounded explode, no corpus window") {
    val p = plan(graft.operators.EventsOps.rollingActives(spark, sf))
    assert(!p.contains("Window"), s"no window operator:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Generate explode"),
      s"window expansion must be the sequence explode:\n${p.take(2000)}")
  }

  test("q213 contract suite: one scan per table, constraints fan out scan-free") {
    val p = plan(graft.quality.Contracts.contractAudit(spark, sf))
    assertNoJoin(p, "contractAudit")
    assert("Scan parquet".r.findAllIn(p).length <= 2,
      s"orders + lineitem scanned once each:\n${p.take(2000)}")
  }

  test("q217 top-k drift: bounded heap per week, prior week broadcasts") {
    val p = plan(graft.operators.Relational.weeklyTopkDrift(spark, sf))
    assert(!p.contains("Window"), s"no window sort over parts:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"calendar-bounded drift join must broadcast:\n${p.take(2000)}")
  }

  test("q224 link prediction: keyed wedge join, no unkeyed pairing") {
    import spark.implicits._
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val p = plan(graft.operators.GraphOps
      .linkPredictionFor(edges, materialize = false))
    // the wedge self-join must be an EQUI-join on the middle node —
    // an unkeyed pairing here is the O(n²) cliff the cap exists for
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"wedges must pair through the middle-node key:\n${p.take(2000)}")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[m".r
      .findFirstIn(p).isDefined,
      s"wedge join must be keyed on m:\n${p.take(2000)}")
  }

  test("q224 link prediction over the broadcast limit: degrees never ride a hinted broadcast") {
    import spark.implicits._
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val p = planNoAutoBroadcast(graft.operators.GraphOps
      .linkPredictionFor(edges, materialize = false,
        broadcastNodeLimit = Some(0L)))
    assert(!p.contains("BroadcastHashJoin"),
      s"over-limit scoring must not hint-broadcast degrees:\n${p.take(2000)}")
    assert(p.contains("SortMergeJoin"),
      s"over-limit degree joins must sort-merge:\n${p.take(2000)}")
  }

  test("q226 centroid outliers: map-only assignment, one bucket exchange") {
    val p = plan(Similarity.centroidOutliers(spark, sf))
    // assignment is the native argmax-dot projection; the centroid
    // cosine join is nlist-sized and must broadcast; the two windows
    // (rank, bucket size) share the ONE bucket-keyed exchange
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"centroid join must broadcast:\n${p.take(2000)}")
    assert(shuffles(p) <= 1,
      s"rank and size windows must share one bucket exchange:\n${p.take(2000)}")
  }
}
