package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** Incremental view maintenance — the algebra that lets a 100 TB
  * aggregate be kept current by folding in a day's delta instead of
  * recomputing the corpus: aggregation state must be MERGEABLE
  * (cnt/sum add, min/max combine, avg derives from merged sums — never
  * from averaged averages). The same algebra is what map-side partial
  * aggregation and streaming state stores rely on; here it is graded
  * as a first-class contract.
  */
object Incremental {

  /** Delta share for [[aggMaintenance]]'s split: rows with
    * event_id ≡ 0 (mod [[DeltaMod]]) form the late-arriving batch.
    * The split is deliberately ORTHOGONAL to the cube key (a day-cutoff
    * split would make the merge a disjoint union — every key
    * one-sided, the min/max combine never exercised); a late batch
    * lands inside days the base already aggregated, which is exactly
    * when the merge algebra has to be right.
    */
  val DeltaMod = 5L

  /** Deterministic change-batch rule for [[cdcMerge]]: every 7th order
    * key carries an update (+10% price, version 2), every 13th a
    * delete tombstone — overlapping on multiples of 91, so the
    * delete-wins precedence is exercised at every graded scale.
    */
  val CdcUpdateMod = 7L
  val CdcDeleteMod = 13L

  /** CDC MERGE (q199) — the lakehouse upsert: a base snapshot merged
    * with a change batch of updates and delete tombstones,
    * last-write-wins by (version, change precedence), deletes final.
    * The Spark-first shape is NOT a row-at-a-time MERGE INTO loop but
    * one unioned window: base rows (version 1) and change rows
    * (version 2) share the key partition, `row_number` over
    * (version DESC, is_delete DESC) picks each key's survivor, and a
    * surviving tombstone erases the key. Output is the audit panel —
    * per-action row counts plus exact integer checksums (bit_xor of
    * key·10⁹ ⊕ cents — the TableDiff rule: XOR, never SUM, so the
    * checksum cannot wrap) over the merged state, certified against a
    * direct anti-join construction in the same query (`matches_direct`
    * must grade true, or the hash gate fails).
    *
    * Scale: one key-partitioned window over base ∪ changes (the union
    * is the same width), both certification sides partition on the
    * same key, no broadcast of anything data-sized.
    */
  def cdcMerge(spark: SparkSession, dir: String): DataFrame =
    cdcMergeFor(Tables.orders(spark, dir))

  def cdcMergeFor(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = orders.select(col("o_orderkey").as("k"),
      Determinism.cents(col("o_totalprice")).as("v_c"),
      lit(1L).as("version"), lit(0L).as("is_delete"))
    val changes = orders
      .filter(col("o_orderkey") % CdcUpdateMod === 0L ||
        col("o_orderkey") % CdcDeleteMod === 0L)
      .select(col("o_orderkey").as("k"),
        expr("CAST(" + Determinism.centsSql("o_totalprice * 1.1") +
          " AS BIGINT)").as("v_c"),
        lit(2L).as("version"),
        (col("o_orderkey") % CdcDeleteMod === 0L).cast("long").as("is_delete"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("version").desc, col("is_delete").desc)
    val merged = base.unionByName(changes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_delete") === 0L)
    // direct construction: deletes removed, updates override, rest kept
    val updated = changes.filter(col("is_delete") === 0L)
    val direct = base
      .join(changes.select(col("k")).distinct(), Seq("k"), "left_anti")
      .select(col("k"), col("v_c"))
      .unionByName(updated.select(col("k"), col("v_c")))
    def checksum(df: DataFrame) = df.agg(
      count(lit(1)).as("n"),
      expr("bit_xor(k * 1000000000 + v_c)").as("xsum"))
    val m = checksum(merged.select(col("k"), col("v_c")))
      .select(col("n").as("n_merged"), col("xsum").as("xsum_merged"))
    val d = checksum(direct)
      .select(col("n").as("n_direct"), col("xsum").as("xsum_direct"))
    val acts = base.unionByName(changes).agg(
      sum(when(col("version") === 1L, 1L).otherwise(0L)).as("n_base"),
      sum(when(col("version") === 2L && col("is_delete") === 0L, 1L)
        .otherwise(0L)).as("n_updates"),
      sum(when(col("is_delete") === 1L, 1L).otherwise(0L)).as("n_deletes"))
    acts.crossJoin(broadcast(m)).crossJoin(broadcast(d))
      .select(col("n_base"), col("n_updates"), col("n_deletes"),
        col("n_merged"), col("xsum_merged"),
        (col("n_merged") === col("n_direct") &&
          col("xsum_merged") === col("xsum_direct")).as("matches_direct"))
  }

  /** q162: maintain the per-(event_type, day) revenue cube
    * incrementally — partials over the base rows, partials over the
    * late-arriving delta batch, merged by the state algebra — and
    * certify every key against the direct full recompute in the same
    * query (`matches_full`, expected universally true; a key where the
    * merge law broke would grade false and fail the hash gate).
    *
    * Scale: both partial aggregations scan their rows once; the merge
    * and the certification join run over KEY-sized relations. The full
    * recompute exists only to certify the contract at test scale — the
    * production path is base ⊕ delta.
    */
  def aggMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr(s"ts_ns DIV $dayNs").as("day"), cents(col("value")).as("v"))
    def partials(df: DataFrame) = df
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_c"),
        min(col("v")).as("min_c"), max(col("v")).as("max_c"))
    val base = partials(ev.filter(col("event_id") % DeltaMod =!= 0L))
    val delta = partials(ev.filter(col("event_id") % DeltaMod === 0L))
    val merged = base.alias("b")
      .join(delta.alias("d"), Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("b.cnt"), lit(0L)) + coalesce(col("d.cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("b.sum_c"), lit(0L)) + coalesce(col("d.sum_c"), lit(0L)))
          .as("sum_c"),
        // explicit null handling: LEAST/GREATEST null semantics differ
        // across engines, so spell the absent-side case out
        when(col("b.min_c").isNull, col("d.min_c"))
          .when(col("d.min_c").isNull, col("b.min_c"))
          .otherwise(least(col("b.min_c"), col("d.min_c"))).as("min_c"),
        when(col("b.max_c").isNull, col("d.max_c"))
          .when(col("d.max_c").isNull, col("b.max_c"))
          .otherwise(greatest(col("b.max_c"), col("d.max_c"))).as("max_c"))
      // avg from MERGED sums — never an average of averages
      .withColumn("avg_c", expr("sum_c DIV cnt"))
    val full = partials(ev).withColumn("avg_c", expr("sum_c DIV cnt"))
    merged.alias("m")
      .join(full.alias("f"), Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("m.cnt").as("cnt"),
        col("m.sum_c").as("sum_c"), col("m.min_c").as("min_c"),
        col("m.max_c").as("max_c"), col("m.avg_c").as("avg_c"),
        (col("m.cnt") === col("f.cnt") && col("m.sum_c") === col("f.sum_c") &&
          col("m.min_c") === col("f.min_c") &&
          col("m.max_c") === col("f.max_c") &&
          col("m.avg_c") === col("f.avg_c")).as("matches_full"))
  }
}
