package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Scale-rehearsal tooling: synthesize an sf1-equivalent (10×) corpus
  * from the sf0.1 testdata and report the cap-truncation diagnostics the
  * dedup family's 100 TB story rests on.
  *
  * Synthesis preserves the STRUCTURE of the workload rather than copying
  * rows verbatim — verbatim replicas would make every document an exact
  * duplicate of its 9 clones, turning the near-dup pair space quadratic
  * in the replication factor and measuring a workload that never occurs:
  *
  *  - documents: every token gets a per-replica suffix, so replica
  *    shingle/token/minhash spaces are disjoint. Per-(source, shingle)
  *    document frequency — the quantity [[Dedup.DfCap]] bounds — is
  *    unchanged; the number of buckets grows 10×. That is exactly the
  *    "more shards, same density" shape of a larger crawl.
  *  - embeddings: each replica's vector is the original rotated by k
  *    positions — norm-preserving (same quantized self-dot) but
  *    direction-changing, so replicas land in different IVF buckets
  *    instead of stacking 10 exact copies into one.
  *
  * Usage:
  *   runMain graft.tools.ScaleRehearsal scale <srcDir> <outDir> <factor>
  *   runMain graft.tools.ScaleRehearsal caps <dir>
  */
object ScaleRehearsal {

  /** doc_id/vec_id shift per replica; far above any testdata id. */
  val IdShift = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    args.toList match {
      case "scale" :: src :: out :: factor :: Nil =>
        scaleUp(spark, src, out, factor.toInt)
      case "caps" :: dir :: Nil =>
        capReport(spark, dir)
      case other =>
        System.err.println(s"unknown args: $other"); sys.exit(2)
    }
    spark.stop()
  }

  private def replicate(base: DataFrame, factor: Int)(
      replica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(k => replica(base, k)).reduce(_.unionAll(_))

  def scaleUp(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val docs = replicate(Tables.documents(spark, src), factor) { (df, k) =>
      val text =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + s"x$k")
      df.select(
        (col("doc_id") + lit(k * IdShift)).as("doc_id"),
        text.as("text"), col("lang"), col("source"), col("n_chars"))
    }
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val embs = replicate(Tables.embeddings(spark, src), factor) { (df, k) =>
      val n = 64 // testdata embedding dim
      val rot =
        if (k == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${k % n} + 1, $n - ${k % n}), " +
          s"slice(embedding, 1, ${k % n}))")
      df.select(
        (col("vec_id") + lit(k * IdShift)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }
    embs.repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // events: user_id stays in the ORIGINAL customer key space — the
    // dimension is copied unscaled below, and shifting user_id would
    // make every replica's events join zero customers, understating
    // fact-dim join cost by 1/factor (orders keep o_custkey unshifted
    // for exactly this reason). Per-user stream structure is preserved
    // by shifting each replica one full time EPOCH instead: the same
    // users re-enact their month k spans later, so sessions/funnels/
    // as-of joins see 10× independent sessions, not 10 stacked copies
    // of each event at one instant.
    // raw read, not Tables.events: preserve the stored ts representation
    // (int64 nanos OR µs NTZ timestamp — see Tables.normalizeEventTime)
    // bit-for-bit across replicas; an NTZ column written back stays
    // isAdjustedToUTC=false µs, so the rehearsal corpus keeps the same
    // encoding hazards as the source it scales
    val rawEvents = spark.read.parquet(s"$src/events.parquet")
    val gapUs = 2L * 86400L * 1000000L // 2-day gap > any session timeout
    val evs =
      if (rawEvents.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType) {
        val tsRange = rawEvents.agg(min(col("ts")), max(col("ts"))).first()
        val epochNs = tsRange.getLong(1) - tsRange.getLong(0) + gapUs * 1000L
        replicate(rawEvents, factor) { (df, k) =>
          df.withColumn("event_id", col("event_id") + lit(k * IdShift))
            .withColumn("ts", col("ts") + lit(k * epochNs))
        }
      } else {
        val tsRange = rawEvents
          .agg(min(unix_micros(col("ts").cast("timestamp"))),
            max(unix_micros(col("ts").cast("timestamp")))).first()
        val epochUs = tsRange.getLong(1) - tsRange.getLong(0) + gapUs
        replicate(rawEvents, factor) { (df, k) =>
          df.withColumn("event_id", col("event_id") + lit(k * IdShift))
            .withColumn("ts",
              expr(s"timestampadd(MICROSECOND, ${k * epochUs}L, ts)"))
        }
      }
    evs.repartition(16).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    // relational fact tables: orders/lineitem replicate with shifted
    // order keys (the join key stays consistent across the two tables,
    // so orders ⋈ lineitem behaves identically per replica); customer
    // keys are NOT shifted — the dimension stays fixed while facts grow,
    // which is the real warehouse scale shape (10× orders per customer)
    val rawOrders = spark.read.parquet(s"$src/orders.parquet")
    replicate(rawOrders, factor) { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * IdShift))
    }.repartition(16).write.mode("overwrite").parquet(s"$out/orders.parquet")
    val rawLineitem = spark.read.parquet(s"$src/lineitem.parquet")
    replicate(rawLineitem, factor) { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * IdShift))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // dimensions: copied unscaled (region/nation/customer/supplier/part)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"[scale] wrote ${factor}x documents+embeddings+events+orders+lineitem " +
      s"(+unscaled dims) to $out")
  }

  /** How often each dedup-family cap actually truncates: the 100 TB
    * claim is "bounded state per bucket"; this measures how much signal
    * the bound discards at the rehearsal scale.
    */
  def capReport(spark: SparkSession, dir: String): Unit = {
    val docs = Tables.documents(spark, dir)

    val shingleBuckets = Dedup.hashedShingles(docs)
      .groupBy(col("source"), col("shash")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("df") > Dedup.DfCap, 1L).otherwise(0L)).as("over_df_cap"),
        max(col("df")).as("max_df"))
      .first()
    println(s"[caps] shingle buckets=${shingleBuckets.getLong(0)} " +
      s"over_DfCap(${Dedup.DfCap})=${shingleBuckets.getLong(1)} " +
      s"max_df=${shingleBuckets.getLong(2)}")

    val bands = Dedup.lshBandKeys(docs)
      .groupBy(col("band"), col("k1"), col("k2")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("n") > Dedup.BandCap, 1L).otherwise(0L)).as("over_band_cap"),
        max(col("n")).as("max_bucket"))
      .first()
    println(s"[caps] lsh band buckets=${bands.getLong(0)} " +
      s"over_BandCap(${Dedup.BandCap})=${bands.getLong(1)} " +
      s"max_bucket=${bands.getLong(2)}")

    // PQ band buckets (q88): a 16-dim codebook slice shared by a large
    // corpus fraction shows up here as max_bucket approaching BandCap
    val pqBands = graft.operators.Similarity.pqBandKeys(spark, dir)
      .groupBy(col("band"), col("k1"), col("k2")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("n") > Dedup.BandCap, 1L).otherwise(0L)).as("over_band_cap"),
        max(col("n")).as("max_bucket"))
      .first()
    println(s"[caps] pq band buckets=${pqBands.getLong(0)} " +
      s"over_BandCap(${Dedup.BandCap})=${pqBands.getLong(1)} " +
      s"max_bucket=${pqBands.getLong(2)}")

    // derived codebook width: k ∝ √N keeps the q88 band key space (k²)
    // growing with the corpus instead of pigeonholing into BandCap
    val nV = Tables.embeddings(spark, dir).count()
    val dk = graft.operators.Similarity.pqKFor(nV)
    val pqAuto = graft.operators.Similarity.pqBandKeysFor(spark, dir, dk)
      .groupBy(col("band"), col("k1"), col("k2")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("n") > Dedup.BandCap, 1L).otherwise(0L)).as("over_band_cap"),
        max(col("n")).as("max_bucket"))
      .first()
    println(s"[caps] pq-auto n=$nV k=$dk buckets=${pqAuto.getLong(0)} " +
      s"over_BandCap(${Dedup.BandCap})=${pqAuto.getLong(1)} " +
      s"max_bucket=${pqAuto.getLong(2)}")

    val emb = graft.operators.Similarity.ivfAssignments(spark, dir)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("n") > Dedup.EmbBucketCap, 1L).otherwise(0L)).as("over_emb_cap"),
        max(col("n")).as("max_bucket"))
      .first()
    println(s"[caps] ivf buckets=${emb.getLong(0)} " +
      s"over_EmbBucketCap(${Dedup.EmbBucketCap})=${emb.getLong(1)} " +
      s"max_bucket=${emb.getLong(2)}")

    // derived index width: nlist ∝ √N keeps max bucket membership flat
    // as the corpus grows (the fixed-nlist row above is the cliff)
    val nVecs = Tables.embeddings(spark, dir).count()
    val dn = graft.operators.Similarity.nlistFor(nVecs)
    val embAuto = graft.operators.Similarity.assignedEmbeddingsFor(spark, dir, dn)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("buckets"),
        sum(when(col("n") > Dedup.EmbBucketCap, 1L).otherwise(0L)).as("over_emb_cap"),
        max(col("n")).as("max_bucket"))
      .first()
    println(s"[caps] ivf-auto n=$nVecs nlist=$dn buckets=${embAuto.getLong(0)} " +
      s"over_EmbBucketCap(${Dedup.EmbBucketCap})=${embAuto.getLong(1)} " +
      s"max_bucket=${embAuto.getLong(2)}")

    // derived Bloom sizing: measured FPR over guaranteed non-members
    // must track the target at this corpus scale
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val fps = docs.select(graft.operators.TextOps.fingerprint(col("text")).as("fp")).distinct()
    val nFps = fps.count()
    val bits = graft.operators.Sketches.bloomBitsFor(nFps)
    val bf = fps.agg(expr(s"${graft.functions.GraftFunctions.BloomBuildName}(" +
      s"xxhash64(fp), $nFps, $bits)")).first().getAs[Array[Byte]](0)
    val probes = 1000000L
    val hits = spark.range(probes)
      .withColumn("hit", call_function(graft.functions.GraftFunctions.BloomContainsName,
        lit(bf), xxhash64(concat(lit("nonmember_probe_"), col("id")))))
      .filter(col("hit")).count()
    println(f"[caps] bloom-auto n=$nFps bits=$bits measured_fpr=${hits.toDouble / probes}%.5f " +
      s"target=${graft.operators.Sketches.BloomTargetFpr}")

    // derived-k KMV (q139): ε = 1/√(k−2) is corpus-size invariant, but
    // the realized draw at this NDV must stay inside the graded bound
    val kmv = graft.operators.Sketches.kmvDistinctDerived(spark, dir).first()
    println(s"[caps] kmv-derived k=${kmv.getLong(0)} est_ndv=${kmv.getLong(3)} " +
      s"exact_ndv=${kmv.getLong(4)} err_ppm=${kmv.getLong(5)} " +
      s"bound_ppm=${graft.operators.Sketches.kmvBoundPpm(
        graft.operators.Sketches.KmvTargetRelErr)} ok=${kmv.getBoolean(6)}")
  }
}
