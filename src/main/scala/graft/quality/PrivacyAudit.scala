package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Re-identification-risk auditing over a curated table — the privacy
  * gate a dataset passes before release, complementing the content
  * scrubbers ([[graft.operators.TextOps.piiScrub]] removes identifiers
  * from TEXT; this audits the STRUCTURED side: can a row be singled out
  * by its quasi-identifier combination?).
  *
  * Semantics (Sweeney's k-anonymity / Machanavajjhala's l-diversity):
  * a quasi-identifier (QI) group is k-anonymous when at least `k` rows
  * share the full QI tuple, and l-diverse when the group carries at
  * least `l` distinct values of the sensitive attribute. Groups failing
  * either gate must be generalized or suppressed; the audit also
  * evaluates the first rung of the classic full-domain generalization
  * ladder (coarsen the most specific QI column to `*`) so the release
  * decision — publish at level 0, or generalize to level 1 — is read
  * directly off the result.
  *
  * Scale: each level is one hash-aggregate on the QI tuple with a
  * distinct-count — partial aggregation map-side, one shuffle per
  * level on group-count-bounded relations (QI cardinality, not row
  * count). No windows, no joins, no row-level output: safe verbatim at
  * 100 TB.
  */
object PrivacyAudit {

  /** k-anonymity threshold (minimum group size). */
  val KAnon = 5L

  /** l-diversity threshold (minimum distinct sensitive values). */
  val LDiv = 3L

  /** Sensitive-attribute band width in cents ($1000 bands). */
  val BandCents = 100000L

  /** Offset making banded balances non-negative before the truncating
    * integer division, so Spark's `DIV` (truncate toward zero) and the
    * oracle's `//` agree without a floor adjustment: acctbal cents are
    * ≥ −100 000 in TPC-H-shaped data, and any negative remainder would
    * otherwise round the band toward zero instead of −∞.
    */
  val BandOffsetCents = 100000000L

  /** Per-group audit of `customer` at generalization levels 0 and 1.
    *
    * QI = (c_nationkey, c_mktsegment); sensitive = account balance in
    * $1000 bands (cents DIV [[BandCents]], offset non-negative).
    * Level 0 groups on the full QI; level 1 coarsens `c_mktsegment`
    * to `*`. Output: one row per (level, QI group) with the group
    * size, its sensitive diversity, and both gate verdicts.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame =
    kAnonymityAuditFor(Tables.customer(spark, dir))

  def kAnonymityAuditFor(customer: DataFrame): DataFrame = {
    val base = customer
      .select(
        col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        graft.operators.Determinism.cents(col("c_acctbal")).as("bal_cents"))
      .select(col("nation"), col("segment"),
        expr(s"(bal_cents + $BandOffsetCents) DIV $BandCents").as("bal_band"))
    def audit(level: Int,
        grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
      grouped
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("bal_band")).as("l_distinct"))
        .select(lit(level.toLong).as("level"), col("nation"), col("segment"),
          col("n_rows"), col("l_distinct"),
          (col("n_rows") >= KAnon).as("k_ok"),
          (col("l_distinct") >= LDiv).as("l_ok"))
    val lvl0 = audit(0, base.groupBy(col("nation"), col("segment")))
    val lvl1 = audit(1, base.withColumn("segment", lit("*"))
      .groupBy(col("nation"), col("segment")))
    lvl0.unionByName(lvl1)
  }

  /** Bits of the per-group hash feeding the geometric noise sampler —
    * also the cap on the trailing-zero count (P(cap) = 2^−cap, never
    * observed in practice).
    */
  val DpNoiseBits = 16

  /** Domain-prefixed salt for the q209 noise hash — a release under a
    * different salt draws fresh noise (the "new epsilon budget, new
    * randomness" discipline).
    */
  val DpSalt = "dp1"

  /** Differentially-private release of per-(source, lang) document
    * counts (q209) — the geometric mechanism (Ghosh–Roughgarden–
    * Sundararajan): additive two-sided geometric noise with ratio 1/2,
    * i.e. ε = ln 2 per released count. Published aggregate panels over
    * curated corpora (the "dataset card" counts) need exactly this
    * before leaving the enclave; k-anonymity (the audit above) gates
    * row releases, the noisy panel gates AGGREGATE releases.
    *
    * The noise is deterministic given (salt, group key) — the
    * portable-hash discipline every sampler in the engine uses, which
    * is what makes the mechanism oracle-gradable: a trailing-zero
    * count of a [[DpNoiseBits]]-bit md5-derived value is Geometric(1/2)
    * (tz = bit_count(v XOR (v−1)) − 1, pure integer on both engines),
    * a further hash bit supplies the sign. The release panel keeps the
    * true count and the noise term ALONGSIDE the noisy count — it is
    * the mechanism-calibration audit; the publishable projection drops
    * them.
    *
    * Scale: one hash-aggregate on the group key plus a map-only
    * projection over the group-cardinality-bounded relation. No
    * shuffle beyond the count itself.
    */
  def dpNoisyCounts(spark: SparkSession, dir: String): DataFrame =
    dpNoisyCountsFor(Tables.documents(spark, dir))

  def dpNoisyCountsFor(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val md5p = graft.functions.GraftFunctions.Md5PrefixName
    docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("fp",
        expr(s"$md5p(concat('$DpSalt:', source, ':', lang), 12)"))
      .withColumn("tz", expr(
        s"""CASE WHEN fp % ${1L << DpNoiseBits} = 0 THEN $DpNoiseBits
           |ELSE CAST(bit_count((fp % ${1L << DpNoiseBits})
           |  ^ (fp % ${1L << DpNoiseBits} - 1)) AS BIGINT) - 1
           |END""".stripMargin))
      .withColumn("noise", expr(
        s"CASE WHEN (fp DIV ${1L << DpNoiseBits}) % 2 = 1 THEN tz ELSE -tz END"))
      .select(col("source"), col("lang"), col("n_true"), col("noise"),
        greatest(lit(0L), col("n_true") + col("noise")).as("noisy_n"))
  }
}
