package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  * Numerics: dot products and norms are computed element-wise in double
  * (bit-exact for float inputs), quantized to integers per element, and
  * summed exactly — so scores and rankings are identical across engines
  * and across partitionings. Cosine is reported in exact ppm.
  *
  * Scale: the brute-force path broadcasts the (small) query set against
  * the full table — a map-only scan, no shuffle. The IVF path assigns
  * vectors to centroid buckets once, then probes only nprobe buckets per
  * query: the standard trade of recall for a ~nlist/nprobe scan
  * reduction at 100 TB.
  */
object Similarity {

  /** Quantized dot product of two float arrays — the native codegen'd
    * [[graft.functions.QuantizedDot]] expression (identical semantics to
    * the portable zip_with+aggregate SQL the oracle runs, far faster: a
    * primitive loop in whole-stage codegen instead of an interpreted
    * lambda per element).
    */
  private def dotQ(a: String, b: String): Column =
    expr(s"${graft.functions.GraftFunctions.DotName}($a, $b)")

  private def normQ(a: String): Column = dotQ(a, a)

  private def withFns(spark: SparkSession): Unit =
    graft.functions.GraftFunctions.ensureRegistered(spark)

  /** The deterministic query subset: every 100th vector. */
  private def queries(df: DataFrame): DataFrame =
    df.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Brute-force cosine top-k (k=5) — the exact baseline every ANN
    * variant is measured against. Broadcast queries × full scan, ranked
    * by quantized cosine with vec_id tie-break.
    */
  def bruteForceKnn(spark: SparkSession, dir: String): DataFrame = {
    withFns(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normQ("embedding").as("n_emb"))
    val q = queries(Tables.embeddings(spark, dir))
      .withColumn("n_q", normQ("q_emb"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dot_q", dotQ("q_emb", "embedding"))
      .withColumn("cos_ppm", expr(
        "CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 / (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_ppm").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos_ppm"), col("rank"))
  }

  val IvfNlist = 16
  val IvfNprobe = 4

  /** IVF bucket assignment: centroids are the first `IvfNlist` vectors
    * (deterministic seed set); every vector lands in the bucket of its
    * max-dot-product centroid.
    */
  def ivfAssignments(spark: SparkSession, dir: String): DataFrame = {
    withFns(spark)
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.filter(col("vec_id") < IvfNlist)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dot_c").desc, col("c_id").asc)
    emb.join(broadcast(cents))
      .withColumn("dot_c", dotQ("c_emb", "embedding"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("c_id").as("bucket"))
  }

  /** IVF-probed ANN: queries probe their `IvfNprobe` best buckets, then
    * rank exactly within the probed subset. Returns the same shape as
    * [[bruteForceKnn]]; recall < 1 by construction — verified against the
    * brute-force baseline in the test suite.
    */
  def ivfKnn(spark: SparkSession, dir: String): DataFrame = {
    withFns(spark)
    val emb = Tables.embeddings(spark, dir)
    val assign = ivfAssignments(spark, dir)
    val cents = emb.filter(col("vec_id") < IvfNlist)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val q = queries(emb).withColumn("n_q", normQ("q_emb"))
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("dot_c").desc, col("c_id").asc)
    val probes = q.join(broadcast(cents))
      .withColumn("dot_c", dotQ("c_emb", "q_emb"))
      .withColumn("rk", row_number().over(probeW))
      .filter(col("rk") <= IvfNprobe)
      .select(col("q_id"), col("q_emb"), col("n_q"), col("c_id").as("bucket"))
    val candidates = Tables.embeddings(spark, dir)
      .join(assign, "vec_id")
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("n_emb", normQ("embedding"))
      .withColumn("dot_q", dotQ("q_emb", "embedding"))
      .withColumn("cos_ppm", expr(
        "CAST(floor(CAST(dot_q AS DOUBLE) * 1000000.0 / (sqrt(CAST(n_q AS DOUBLE)) * sqrt(CAST(n_emb AS DOUBLE)))) AS BIGINT)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_ppm").desc, col("vec_id").asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos_ppm"), col("rank"))
  }

  /** Per-label embedding norm statistics — array numerics as a plain
    * aggregation (exact integer norms).
    */
  def normStatsByLabel(spark: SparkSession, dir: String): DataFrame = {
    withFns(spark)
    Tables.embeddings(spark, dir)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        sum(normQ("embedding")).as("sum_norm_q"),
        min(normQ("embedding")).as("min_norm_q"),
        max(normQ("embedding")).as("max_norm_q"))
  }
}
