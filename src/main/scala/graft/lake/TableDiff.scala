package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed table diff — the reconciliation operator a versioned lake
  * needs next to snapshots ([[Versioning]]) and integrity audits
  * (q149): given two versions of a keyed table, classify every key as
  * added / removed / changed / unchanged and fingerprint each class, so
  * two table states can be compared without shipping either one.
  *
  * Scale design: one full-outer equi-join on the key (both sides
  * shuffle-partitioned by it once — the minimal possible movement for a
  * keyed diff; with bucketed tables it would be co-located and
  * shuffle-free), change detection by comparing per-row fingerprints of
  * the compared columns (computed inside the scan, so wide rows never
  * travel — only key + 60-bit fingerprint), then one aggregation over
  * the classified keys. Output is class-level counts + checksums:
  * metadata-sized at any table size.
  */
object TableDiff {

  /** Classify `newDf` against `oldDf` by `keyCol`, comparing the
    * md5-prefix fingerprint of `fpExpr` (a SQL expression over the
    * row's compared columns — stringified once per row, inside the
    * scan).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      fpExpr: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(oldDf.sparkSession)
    val fp = s"${graft.functions.GraftFunctions.Md5PrefixName}($fpExpr, 12)"
    def side(df: DataFrame, tag: String) =
      df.select(col(keyCol).as("k"), expr(fp).as(s"fp_$tag"))
    side(oldDf, "old")
      .join(side(newDf, "new"), Seq("k"), "full_outer")
      .withColumn("class",
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") === col("fp_new"), lit("unchanged"))
          .otherwise(lit("changed")))
      .groupBy(col("class"))
      // bit_xor, not sum: a 48-bit fingerprint summed over millions of
      // keys overflows a long; xor is order-independent and width-stable
      .agg(count(lit(1)).as("n_keys"),
        sum(col("k")).as("key_sum"),
        expr("bit_xor(coalesce(fp_new, fp_old))").as("fp_xor"))
  }

  /** Deterministic version rules for [[diffAudit]], shared with the
    * oracle: v1 lacks keys ≡1 (mod [[AddMod]]) — those surface as
    * ADDED; v2 lacks keys ≡0 (mod [[DeleteMod]]) — REMOVED; v2 bumps
    * price 10% on keys ≡0 (mod [[ChangeMod]]) — CHANGED where present
    * in both; the rest is UNCHANGED.
    */
  val AddMod = 89L
  val DeleteMod = 97L
  val ChangeMod = 10L

  /** q161: diff audit — derives two deterministic versions of `orders`
    * and diffs them, so every class carries a non-trivial,
    * oracle-predicted population. The fingerprint covers the mutable
    * columns (status, price) in integer cents.
    */
  def diffAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        graft.operators.Determinism.cents(col("o_totalprice")).as("price_c"))
    val v1 = orders.filter(col("o_orderkey") % AddMod =!= 1L)
    val v2 = orders
      .filter(col("o_orderkey") % DeleteMod =!= 0L)
      .withColumn("price_c",
        when(col("o_orderkey") % ChangeMod === 0L,
          expr("price_c + price_c DIV 10")).otherwise(col("price_c")))
    diff(v1, v2, "o_orderkey",
      "concat_ws('|', o_orderstatus, CAST(price_c AS STRING))")
  }
}
