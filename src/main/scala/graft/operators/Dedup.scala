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

  /** Distinct k-token shingle ARRAY per document (k=3, 1-based indexing so
    * the same expression is portable to the oracle dialect), with the
    * shingle count alongside — so downstream pair joins can carry `n_sh`
    * through the explode instead of re-joining a separate counts relation.
    */
  def docShingles(df: DataFrame, k: Int = 3): DataFrame =
    df.withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= k)
      .withColumn("sh_arr", array_distinct(expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), " +
          (1 to k).map(j => s"element_at(toks, i + ${j - 1})")
            .mkString("i -> concat_ws(' ', ", ", ", "))"))))
      .select(col("doc_id"), col("source"),
        col("sh_arr"), size(col("sh_arr")).cast("long").as("n_sh"))

  /** Exploded shingle rows (compatibility view of [[docShingles]]). */
  def shingles(df: DataFrame, k: Int = 3): DataFrame =
    docShingles(df, k)
      .select(col("doc_id"), col("source"), explode(col("sh_arr")).as("sh"))

  /** 60-bit md5-derived hash of the shingle text: pair joins shuffle and
    * compare fixed-width longs instead of multi-token strings. Collisions
    * (~n²/2⁶¹) are identical on both engines, so the oracle still matches.
    */
  private val shash: Column =
    expr("CAST(conv(substr(md5(sh), 1, 15), 16, 10) AS BIGINT)")

  /** Pairwise n-gram Jaccard similarity within `source` blocks:
    * explode shingles (hashed to longs, with `n_sh` carried through) →
    * join on (source, shash) → |A∩B| per pair → Jaccard in exact ppm.
    * Returns pairs with J ≥ 0.3. Carrying the per-doc shingle count on
    * the exploded rows removes the two count-lookup joins the naive plan
    * needs — one self-join plus one aggregation, total.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    def side(tag: String) =
      docShingles(Tables.documents(spark, dir))
        .select(col("source"), col("doc_id").as(s"doc_$tag"),
          col("n_sh").as(s"n_$tag"), explode(col("sh_arr")).as("sh"))
        .select(col("source"), col(s"doc_$tag"), col(s"n_$tag"), shash.as("shash"))
    side("a").join(side("b"), Seq("source", "shash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard_ppm", expr("inter * 1000000 DIV (n_a + n_b - inter)"))
      .filter(col("jaccard_ppm") >= 300000)
      .select(col("doc_a"), col("doc_b"), col("jaccard_ppm"))
  }

  val MinhashK = 8

  /** Affine-permutation constants: mh_i = (A_i·h + B_i) mod 2³². A_i < 2¹⁴
    * keeps A·h < 2⁶² for the 48-bit base hash (no ANSI overflow); shared
    * with the oracle SQL so both engines compute identical signatures.
    */
  val MinhashA: Seq[Long] = Seq(12289L, 12323L, 12373L, 12413L, 12437L, 12451L, 12479L, 12487L)
  val MinhashB: Seq[Long] = (0 until MinhashK).map(i => 1000003L * i + 12345L)

  /** 48-bit md5-derived base hash of a shingle — computed ONCE per shingle
    * row; the K permutations are affine transforms of it (8× fewer md5
    * evaluations than hashing per-permutation).
    */
  private val baseHash: Column =
    expr("CAST(conv(substr(md5(sh), 1, 12), 16, 10) AS BIGINT)")

  private def mh(i: Int): Column =
    expr(s"(${MinhashA(i)} * h + ${MinhashB(i)}) % 4294967296")

  /** MinHash signatures: K=8 permutations, each the min over the
    * document's shingle set of an affine transform of one shared
    * md5-derived hash. One explode + one groupBy with 8 partial-aggregated
    * mins — a single shuffle, a single md5 per shingle.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    shingles(Tables.documents(spark, dir))
      .select(col("doc_id"), baseHash.as("h"))
      .groupBy(col("doc_id"))
      .agg(
        min(mh(0)).as("mh0"), min(mh(1)).as("mh1"),
        min(mh(2)).as("mh2"), min(mh(3)).as("mh3"),
        min(mh(4)).as("mh4"), min(mh(5)).as("mh5"),
        min(mh(6)).as("mh6"), min(mh(7)).as("mh7"))

  /** Banded LSH over the MinHash signatures: 4 bands × 2 rows. Candidate
    * pairs are documents sharing ≥1 band key; the band join replaces the
    * quadratic all-pairs compare (the 100 TB path: shuffle by band key,
    * pairs only form inside identical-signature buckets). Band keys stay
    * as two long columns — no string concat in the shuffle key.
    */
  def lshCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    // one pass over the signatures: explode band structs instead of a
    // 4-way union (which would recompute the signature aggregation once
    // per band)
    val bandStructs = array((0 until MinhashK / 2).map { bandIdx =>
      struct(
        lit(bandIdx).as("band"),
        col(s"mh${2 * bandIdx}").as("k1"),
        col(s"mh${2 * bandIdx + 1}").as("k2"))
    }: _*)
    val bands = sig
      .select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"),
        col("b.k1").as("k1"), col("b.k2").as("k2"))
    val l = bands.select(col("band"), col("k1"), col("k2"), col("doc_id").as("doc_a"))
    val r = bands.select(col("band"), col("k1"), col("k2"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "k1", "k2"))
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
