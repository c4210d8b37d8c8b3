package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The PERSISTED ANN index artifact — the serving-deployment half of the
  * IVF/PQ family (train q109 → commit → search), closing the round-11
  * architecture seam: every graded search (q106/q108) recomputes bucket
  * assignment and PQ codes from the raw corpus per invocation, which is
  * the right posture for a one-shot batch job but wrong for a serving
  * deployment — at 100 TB the assignment pass alone is a full-corpus
  * scan per query batch. A deployment builds the index ONCE, commits it
  * atomically, and serves every search FROM the committed artifact.
  *
  * Layout (all under an app-id-isolated root, the q156/q234
  * single-writer rule):
  * {{{
  *   members/bucket=<b>/   (vec_id, embedding)   — IVF serving scan
  *   codes/bucket=<b>/     (vec_id, code_0..7)   — IVF-PQ serving scan
  *   model/kind=ivf/       (c_id, embedding)     — nlist centroids
  *   model/kind=pq/        (c_id, embedding)     — k codebook seeds
  *   _index_version.json   layout version + derived knobs + corpus N
  * }}}
  *
  * Every table commits through [[graft.lake.AtomicPartitionWriter
  * .commitPartitioned]] (per-partition swap protocol; a crashed build
  * leaves `_tmp`/`_old` litter its `repair` reaps, never a torn index),
  * and the version sidecar is written LAST — its presence certifies a
  * complete commit, the q234 version-sidecar discipline.
  *
  * Scale design (100 TB lens):
  *  - Bucket-partitioned members/codes mean a served query batch reads
  *    only its probed buckets' directories — nprobe/nlist of the
  *    corpus — and the committed layout is exactly the shuffle the live
  *    path pays per invocation, paid once at build time.
  *  - Serving plans carry ZERO corpus re-assignment work: no
  *    `graft_argmax_dot` over the corpus scan, no PQ L2 tables on the
  *    candidate side (AnnIndexSpec locks both); the only corpus-table
  *    touch is the (tiny by construction) query subset.
  *  - The model load is O(nlist·dims) driver-resident — the same
  *    footprint the live path's `centroidLits` collect already has.
  *  - Staleness is first-class: [[stalenessReport]] (q247) reads the
  *    committed counts and the sidecar version and hands the
  *    re-train/re-ingest decision to q132's growth semantics.
  */
object AnnIndex {

  /** Index layout version; a sidecar carrying an older version marks
    * the artifact stale and [[ensureCommitted]] rebuilds it.
    */
  val IndexVersion = 1L

  /** App-id-isolated lake root for the index artifact (the q234
    * staging-dir rule: concurrent Verify ∥ Bench runs never read each
    * other's mid-commit state).
    */
  def indexRoot(spark: SparkSession, dir: String): String =
    s"/tmp/graft_ann_index/${spark.sparkContext.applicationId}/" +
      new java.io.File(dir).getName

  private def membersDir(root: String) = s"$root/members"
  private def codesDir(root: String) = s"$root/codes"
  private def modelDir(root: String) = s"$root/model"
  private def sidecarPath(root: String) = s"$root/_index_version.json"

  /** The committed index's identity card: layout version, corpus size
    * at build time, and the derived knobs frozen into the artifact.
    */
  final case class Meta(version: Long, n: Long, nlist: Int, nprobe: Int,
    k: Int)

  /** Train + commit the full artifact; returns its meta. Build cost is
    * ONE assignment pass for members and ONE combined assignment+coding
    * pass for codes (both map-only projections), each staged once and
    * swapped per bucket — the cost the live q106/q108 pay on EVERY
    * invocation, paid here once per corpus version.
    */
  def buildAndCommit(spark: SparkSession, dir: String): Meta = {
    val n = Tables.rowCountFromFooters(spark, dir, "embeddings")
    val nlist = Similarity.nlistFor(n)
    val nprobe = Similarity.nprobeFor(nlist)
    val k = Similarity.pqKFor(n)
    val root = indexRoot(spark, dir)
    val lakeFs = graft.lake.LakeFs.forSpark(spark)
    val writer = new graft.lake.AtomicPartitionWriter(lakeFs, spark)
    // a rebuild invalidates the previous artifact the moment it starts:
    // drop the sidecar first so a crash mid-build leaves a certifiably
    // incomplete index (ensureCommitted will rebuild), never a sidecar
    // pointing at torn tables
    if (lakeFs.exists(sidecarPath(root))) lakeFs.delete(sidecarPath(root))
    Seq(membersDir(root), codesDir(root), modelDir(root))
      .foreach(writer.repair(_)) // reap crashed-run litter before staging
    writer.commitPartitioned(
      Similarity.assignedEmbeddingsFor(spark, dir, nlist),
      membersDir(root), "bucket")
    writer.commitPartitioned(
      Similarity.pqCodedCorpus(spark, dir, nlist, k),
      codesDir(root), "bucket")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("c_id"), col("embedding"))
    writer.commitPartitioned(
      emb.filter(col("c_id") < nlist).withColumn("kind", lit("ivf"))
        .unionByName(
          emb.filter(col("c_id") < k).withColumn("kind", lit("pq"))),
      modelDir(root), "kind")
    val meta = Meta(IndexVersion, n, nlist, nprobe, k)
    lakeFs.writeString(sidecarPath(root),
      s"""{"version":${meta.version},"n":${meta.n},"nlist":${meta.nlist},""" +
        s""""nprobe":${meta.nprobe},"k":${meta.k}}""")
    meta
  }

  /** The committed meta, or None when the sidecar is absent (no commit
    * ever completed here) or unparseable.
    */
  def readMeta(spark: SparkSession, dir: String): Option[Meta] = {
    val lakeFs = graft.lake.LakeFs.forSpark(spark)
    val p = sidecarPath(indexRoot(spark, dir))
    if (!lakeFs.exists(p)) None
    else {
      val s = lakeFs.readString(p)
      def f(key: String): Option[Long] =
        s""""$key":(-?\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      for (v <- f("version"); n <- f("n"); nl <- f("nlist");
           np <- f("nprobe"); k <- f("k"))
        yield Meta(v, n, nl.toInt, np.toInt, k.toInt)
    }
  }

  /** The serving entry: reuse the committed artifact when its sidecar
    * certifies the current layout version AND the corpus row count it
    * was built from (footer metadata, no scan) — rebuild otherwise.
    * Idempotent: a second call is a sidecar read, no jobs.
    */
  def ensureCommitted(spark: SparkSession, dir: String): Meta = {
    val n = Tables.rowCountFromFooters(spark, dir, "embeddings")
    readMeta(spark, dir)
      .filter(m => m.version == IndexVersion && m.n == n)
      .getOrElse(buildAndCommit(spark, dir))
  }

  /** Committed model load: the `kind=` slice of the model table,
    * collected to the driver in centroid-id order — O(width·dims), the
    * same footprint as the live path's seed collect.
    */
  private def modelLits(spark: SparkSession, root: String,
      kind: String): Seq[(Long, Array[Float])] =
    spark.read.parquet(s"${modelDir(root)}/kind=$kind")
      .select(col("c_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).toSeq

  /** A committed bucket-partitioned table, with the partition column
    * restored to the long the build wrote (partition-type inference
    * reads small bucket ids back as ints).
    */
  private def bucketTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).withColumn("bucket", col("bucket").cast("long"))

  /** q244: build + commit + audit in one graded query — the executed
    * lake-commit posture of q216/q234, applied to the index artifact.
    * The audit panel reads back the COMMITTED tables (never the build's
    * in-flight relations): per bucket, member count, a bit_xor witness
    * of the membership, the code-table row count and total code mass,
    * plus the frozen knobs — the oracle recomputes all of it from the
    * raw corpus, so a torn commit, a dropped bucket, or a knob drift
    * breaks the hash.
    */
  def commitAudit(spark: SparkSession, dir: String): DataFrame = {
    val meta = buildAndCommit(spark, dir)
    val root = indexRoot(spark, dir)
    val members = bucketTable(spark, membersDir(root))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_members"),
        expr("bit_xor(vec_id)").as("vec_xor"))
    val codeMass = (0 until Similarity.PqSubspaces)
      .map(m => col(s"code_$m")).reduce(_ + _)
    val codes = bucketTable(spark, codesDir(root))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_codes"), sum(codeMass).as("code_mass"))
    members.join(codes, Seq("bucket"))
      .select(col("bucket"), col("n_members"), col("vec_xor"),
        col("n_codes"), col("code_mass"),
        lit(meta.version).as("index_version"),
        lit(meta.nlist.toLong).as("nlist"),
        lit(meta.nprobe.toLong).as("nprobe"),
        lit(meta.k.toLong).as("k"))
  }

  /** q245: the q106-shaped IVF search served FROM the committed
    * artifact — hash-equal to the live q106 by construction (the
    * committed assignment is byte-identical to the live one), but the
    * plan carries zero corpus re-assignment: candidates come off the
    * bucket-partitioned members table, centroids off the committed
    * model, and the corpus table is touched only for the query subset.
    */
  def ivfServe(spark: SparkSession, dir: String): DataFrame = {
    Similarity.withFns(spark)
    val meta = ensureCommitted(spark, dir)
    val root = indexRoot(spark, dir)
    val cents = modelLits(spark, root, "ivf")
    val q = Similarity.queries(Tables.embeddings(spark, dir))
      .withColumn("n_q", Similarity.normQ("q_emb"))
    val probes = q
      .select(col("q_id"), col("q_emb"), col("n_q"),
        explode(slice(sort_array(Similarity.probeRanking(cents, "q_emb")),
          1, meta.nprobe)).as("p"))
      .select(col("q_id"), col("q_emb"), col("n_q"),
        col("p.c_id").as("bucket"))
    val candidates = bucketTable(spark, membersDir(root))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("n_emb", Similarity.normQ("embedding"))
      .withColumn("dot_q", Similarity.dotQ("q_emb", "embedding"))
      .withColumn("cos_ppm", expr(
        "CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 / " +
          "(sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT)"))
    Similarity.topkPerQuery(candidates, "cos_ppm", 5)
  }

  /** q246: the q108-shaped IVF-PQ ADC search served FROM the committed
    * artifact — candidates are 8-byte code rows off the committed codes
    * table (the 100 TB read-3-TB-not-100 property, now without the
    * per-invocation coding pass), LUTs and probes ride the broadcast
    * query side against the committed codebook.
    */
  def ivfPqServe(spark: SparkSession, dir: String): DataFrame = {
    Similarity.withFns(spark)
    val meta = ensureCommitted(spark, dir)
    val root = indexRoot(spark, dir)
    // the ONE ADC pipeline (per-q_id LUT broadcasts + the slice rule —
    // Similarity.adcSearch), with the candidate side swapped for the
    // committed 8-byte code rows and the model read off the artifact
    Similarity.adcSearch(
      bucketTable(spark, codesDir(root)),
      Similarity.queries(Tables.embeddings(spark, dir)),
      modelLits(spark, root, "ivf"), modelLits(spark, root, "pq"),
      meta.nprobe, meta.k, meta.n / 100L + 1L)
  }

  /** Root of the INCREMENTAL-lifecycle artifact (q248) — separate from
    * the full-build root on purpose: the incremental index is built
    * from the crawl BASE split with base-derived knobs/seeds, so its
    * model differs from the full build's; sharing a root would let
    * [[ensureCommitted]] serve q245/q246 from the wrong model.
    */
  private def incRoot(spark: SparkSession, dir: String): String =
    indexRoot(spark, dir) + "_inc"

  /** Lowest-`width` vector ids of `corpus` as the model seed set — the
    * [[Similarity.centroidLits]] rule generalized to a corpus whose ids
    * are not dense from 0 (the crawl base split). TakeOrdered, never a
    * full sort.
    */
  private def seedDf(corpus: DataFrame, width: Int): DataFrame =
    corpus.orderBy(col("vec_id")).limit(width)
      .select(col("vec_id").as("c_id"), col("embedding"))

  private def assignedFor(df: DataFrame,
      ivfCents: Seq[(Long, Array[Float])]): DataFrame =
    Similarity.withBucket(df.select(col("vec_id"), col("embedding")),
      ivfCents, "embedding")
      .select(col("vec_id"), col("embedding"), col("bucket"))

  private def codedFor(df: DataFrame, ivfCents: Seq[(Long, Array[Float])],
      pqCents: Seq[(Long, Array[Float])]): DataFrame =
    Similarity.withPqDistanceArrays(assignedFor(df, ivfCents), pqCents)
      .select(col("vec_id") +: col("bucket") +:
        (0 until Similarity.PqSubspaces)
          .map(m => Similarity.pqCode(m).as(s"code_$m")): _*)

  /** q248: the incremental ingest EXECUTED — q132 reports what an
    * ingest WOULD do to each bucket; this DOES it. The artifact is
    * built from the crawl BASE split (< 0.9 md5, base-derived knobs,
    * lowest-base-id seeds), then the fresh arrivals (≥ 0.9) are
    * assigned + PQ-coded with the COMMITTED model — one map-only pass
    * over the DELTA only — and committed per bucket through
    * [[graft.lake.AtomicPartitionWriter.upsertPartitions]]: only
    * buckets that received arrivals rewrite (IO ∝ touched mass, never
    * the table; the touched set is nlist-bounded, ≤ √N literals in the
    * pruning filter), untouched buckets' files never move, and the
    * version sidecar advances its corpus count LAST so readers gate on
    * a consistent artifact. No full rebuild anywhere.
    *
    * The audit panel reads back the COMMITTED tables: per bucket,
    * member count, bit_xor witness, code rows, how many members are
    * arrivals, plus the frozen base-derived knobs — the oracle replays
    * all of it from the raw corpus (base-seeded centroids over the
    * FULL corpus ≡ base build ∪ delta ingest), so a dropped delta, a
    * clobbered untouched bucket, or a knob drift breaks the hash.
    */
  def incrementalIngestCommit(spark: SparkSession, dir: String): DataFrame = {
    Similarity.withFns(spark)
    val root = incRoot(spark, dir)
    val lakeFs = graft.lake.LakeFs.forSpark(spark)
    val writer = new graft.lake.AtomicPartitionWriter(lakeFs, spark)
    val hb = Sampling.hashBucket("vec_id")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val base = emb.filter(hb < 900000L)
    val arrivals = emb.filter(hb >= 900000L)
    // ---- base build (the q244 machinery, corpus + seeds parameterized)
    val nBase = base.count()
    val nlist = Similarity.nlistFor(nBase)
    val k = Similarity.pqKFor(nBase)
    if (lakeFs.exists(sidecarPath(root))) lakeFs.delete(sidecarPath(root))
    Seq(membersDir(root), codesDir(root), modelDir(root))
      .foreach(writer.repair(_))
    writer.commitPartitioned(
      seedDf(base, nlist).withColumn("kind", lit("ivf"))
        .unionByName(seedDf(base, k).withColumn("kind", lit("pq"))),
      modelDir(root), "kind")
    val ivfCents = modelLits(spark, root, "ivf")
    val pqCents = modelLits(spark, root, "pq")
    writer.commitPartitioned(assignedFor(base, ivfCents),
      membersDir(root), "bucket")
    writer.commitPartitioned(codedFor(base, ivfCents, pqCents),
      codesDir(root), "bucket")
    // ---- delta ingest: assign/code ARRIVALS with the committed model,
    // rewrite only their buckets (existing touched-bucket rows ∪ delta)
    val dm = assignedFor(arrivals, ivfCents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = dm.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)) // ≤ nlist values by construction
    writer.upsertPartitions(
      bucketTable(spark, membersDir(root))
        .filter(col("bucket").isin(touched: _*)).unionByName(dm),
      membersDir(root), "bucket")
    writer.upsertPartitions(
      bucketTable(spark, codesDir(root))
        .filter(col("bucket").isin(touched: _*))
        .unionByName(codedFor(arrivals, ivfCents, pqCents)),
      codesDir(root), "bucket")
    val nArr = arrivals.count()
    dm.unpersist()
    lakeFs.writeString(sidecarPath(root),
      s"""{"version":$IndexVersion,"n":${nBase + nArr},"nlist":$nlist,""" +
        s""""nprobe":${Similarity.nprobeFor(nlist)},"k":$k}""")
    // ---- audit the COMMITTED tables
    val members = bucketTable(spark, membersDir(root))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_members"),
        expr("bit_xor(vec_id)").as("vec_xor"),
        sum(when(hb >= 900000L, 1L).otherwise(0L)).as("n_arrived"))
    val codeMass = (0 until Similarity.PqSubspaces)
      .map(m => col(s"code_$m")).reduce(_ + _)
    val codes = bucketTable(spark, codesDir(root))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_codes"), sum(codeMass).as("code_mass"))
    members.join(codes, Seq("bucket"))
      .select(col("bucket"), col("n_members"), col("vec_xor"),
        col("n_codes"), col("code_mass"), col("n_arrived"),
        lit(IndexVersion).as("index_version"),
        lit(nlist.toLong).as("nlist"), lit(k.toLong).as("k"))
  }

  /** q247: the staleness handoff between the committed artifact and
    * q132's ingest semantics — per bucket, the COMMITTED member count
    * (read back from the artifact, not recomputed), the arrival count
    * of the fresh-crawl split (≥ 0.9 md5, q89's incremental discipline)
    * assigned with the COMMITTED centroids, growth in exact ppm, the
    * q132 mean-dot fit signal, and the sidecar version — everything a
    * re-train/re-commit decision reads. Arrivals' buckets always exist
    * in the index (the artifact covers the full corpus), so the left
    * join only fills buckets with no arrivals.
    */
  def stalenessReport(spark: SparkSession, dir: String): DataFrame = {
    Similarity.withFns(spark)
    val meta = ensureCommitted(spark, dir)
    val root = indexRoot(spark, dir)
    val idx = bucketTable(spark, membersDir(root))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_index"))
    val cents = modelLits(spark, root, "ivf")
    val asn = call_function(graft.functions.GraftFunctions.ArgmaxDotName,
      col("embedding"), Similarity.centMatrixLit(cents))
    val arrivals = Tables.embeddings(spark, dir)
      .filter(Sampling.hashBucket("vec_id") >= 900000L)
      .withColumn("_a", asn)
      .select(
        element_at(Similarity.centIdsLit(cents),
          (col("_a.bucket") + 1).cast("int")).as("bucket"),
        col("_a.dot").as("dot_q"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_new"), sum(col("dot_q")).as("sum_new"))
    idx.join(arrivals, Seq("bucket"), "left_outer")
      .na.fill(0L, Seq("n_new"))
      .select(col("bucket"), col("n_index"), col("n_new"),
        expr("n_new * 1000000 DIV n_index").as("growth_ppm"),
        expr("CASE WHEN n_new = 0 THEN NULL " +
          "ELSE CAST((sum_new DIV n_new) - (CASE WHEN sum_new % n_new <> 0 " +
          "AND sum_new < 0 THEN 1 ELSE 0 END) AS BIGINT) END")
          .as("mean_dot_new_q"),
        lit(meta.version).as("index_version"))
  }
}
