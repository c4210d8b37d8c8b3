package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located joins — the 100 TB
  * pattern for repeated large-fact ⋈ large-fact joins: both sides are
  * written hash-bucketed (and sorted) on the join key once, after which
  * every join on that key is exchange-free — Spark reads matching buckets
  * pairwise instead of shuffling either side.
  *
  * Local-mode caveat baked into the API: bucket pruning/exchange
  * elimination needs `spark.sql.sources.bucketing.enabled` (default true)
  * and both sides bucketed with the same count.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame, table: String, keyCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With aligned
    * bucketing this plans as a zipped per-bucket sort-merge join with NO
    * shuffle exchange on either side (asserted in tests).
    */
  def coLocatedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the observable property bucketing buys.
    */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
