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
