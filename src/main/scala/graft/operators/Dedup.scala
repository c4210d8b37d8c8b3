package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Near-duplicate detection family for training-data curation: n-gram
  * Jaccard (blocked), MinHash signatures + banded LSH candidate pairs,
  * and SimHash. All hashes derive from `md5` so signatures are
  * deterministic and portable across engines — no JVM `hashCode`, no
  * engine-specific `hash()`.
  *
  * Scale design: every stage is explode → hash-shuffle → aggregate with
  * map-side combine; candidate generation joins on (block/band, key)
  * instead of a quadratic cross join, which is what keeps this runnable
  * at 100 TB. Blocking for the exact-Jaccard variant uses the `source`
  * column (a realistic pre-partitioner); MinHash-LSH needs no blocking.
  */
object Dedup {

  /** Distinct k-token shingles per document (k=3), 1-based indexing so
    * the same expression is portable to the oracle dialect.
    */
  def shingles(df: DataFrame, k: Int = 3): DataFrame =
    df.withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .withColumn("sh", explode(array_distinct(expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), " +
          (1 to k).map(j => s"element_at(toks, i + ${j - 1})")
            .mkString("i -> concat_ws(' ', ", ", ", "))")))))
      .select(col("doc_id"), col("source"), col("sh"))

  /** Pairwise n-gram Jaccard similarity within `source` blocks:
    * explode shingles → join on (source, shingle) → |A∩B| per pair →
    * Jaccard in exact ppm. Returns pairs with J ≥ 0.3.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    // no cache: pinning the exploded shingle set for the session's
    // lifetime costs more than recomputation (Catalyst reuses the
    // exchange where plans coincide)
    val sh = shingles(Tables.documents(spark, dir))
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("source"), col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("source"), col("doc_id").as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("source", "sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_sh" -> "n_a")), "doc_a")
      .join(counts.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_sh" -> "n_b")), "doc_b")
      .withColumn("jaccard_ppm", expr("inter * 1000000 DIV (n_a + n_b - inter)"))
      .filter(col("jaccard_ppm") >= 300000)
      .select(col("doc_a"), col("doc_b"), col("jaccard_ppm"))
  }

  val MinhashK = 8

  /** 32-bit md5-derived hash of a shingle under permutation seed `i`. */
  private def mh(i: Int): Column =
    expr(s"CAST(conv(substr(md5(concat('$i:', sh)), 1, 8), 16, 10) AS BIGINT)")

  /** MinHash signatures: K=8 independent permutations, each the min over
    * the document's shingle set of a seeded md5 hash. One explode + one
    * groupBy with 8 partial-aggregated mins — a single shuffle.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    shingles(Tables.documents(spark, dir))
      .groupBy(col("doc_id"))
      .agg(
        min(mh(0)).as("mh0"), min(mh(1)).as("mh1"),
        min(mh(2)).as("mh2"), min(mh(3)).as("mh3"),
        min(mh(4)).as("mh4"), min(mh(5)).as("mh5"),
        min(mh(6)).as("mh6"), min(mh(7)).as("mh7"))

  /** Banded LSH over the MinHash signatures: 4 bands × 2 rows. Candidate
    * pairs are documents sharing ≥1 band key; the band join replaces the
    * quadratic all-pairs compare (the 100 TB path: shuffle by band key,
    * pairs only form inside identical-signature buckets).
    */
  def lshCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    // one pass over the signatures: explode band structs instead of a
    // 4-way union (which would recompute the signature aggregation once
    // per band)
    val bandStructs = array((0 until MinhashK / 2).map { bandIdx =>
      struct(
        lit(bandIdx).as("band"),
        concat_ws("_", col(s"mh${2 * bandIdx}"), col(s"mh${2 * bandIdx + 1}")).as("bkey"))
    }: _*)
    val bands = sig
      .select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val l = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val r = bands.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Embedding-cosine near-duplicates, exact: all vector pairs with
    * quantized cosine ≥ 0.40 (the semantic-dedup baseline). Quadratic in
    * the table — correct reference for the bucketed variant below.
    */
  def embeddingNearDupExact(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val dot = graft.functions.GraftFunctions.DotName
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        expr(s"$dot(embedding, embedding)").as("nq"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("nq").as("n_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("nq").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_ppm", expr(
        s"CAST(floor(CAST($dot(emb_a, emb_b) AS DOUBLE) * 1000000.0 / " +
          "(sqrt(CAST(n_a AS DOUBLE)) * sqrt(CAST(n_b AS DOUBLE)))) AS BIGINT)"))
      .filter(col("cos_ppm") >= 400000)
      .select(col("id_a"), col("id_b"), col("cos_ppm"))
  }

  /** Embedding-cosine near-duplicates, bucketed (the scale path): pairs
    * only form inside an IVF bucket, turning the quadratic compare into
    * per-bucket work after one shuffle on the bucket id. Near-identical
    * vectors share a nearest centroid, so recall on true near-dups is
    * high; verified a superset of exact same-bucket dups in tests.
    */
  def embeddingNearDupBucketed(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val dot = graft.functions.GraftFunctions.DotName
    val assign = Similarity.ivfAssignments(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .join(assign, "vec_id")
      .select(col("bucket"), col("vec_id"), col("embedding"),
        expr(s"$dot(embedding, embedding)").as("nq"))
    val a = e.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nq").as("n_a"))
    val b = e.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nq").as("n_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_ppm", expr(
        s"CAST(floor(CAST($dot(emb_a, emb_b) AS DOUBLE) * 1000000.0 / " +
          "(sqrt(CAST(n_a AS DOUBLE)) * sqrt(CAST(n_b AS DOUBLE)))) AS BIGINT)"))
      .filter(col("cos_ppm") >= 400000)
      .select(col("id_a"), col("id_b"), col("cos_ppm"))
  }

  val SimhashBits = 32

  /** 32-bit SimHash: every token occurrence votes ±1 on each bit of its
    * md5-derived 32-bit value; bit b of the signature is 1 iff the vote
    * sum is positive. Computed as one explode + one groupBy with 32
    * partial-aggregated sums (no per-bit row blowup).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val tv = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("tv", expr("CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT)"))
    val votes = (0 until SimhashBits).map { b =>
      sum(expr(s"2 * (shiftright(tv, $b) & 1) - 1")).as(s"s$b")
    }
    val sig = (0 until SimhashBits).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    tv.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }
}
