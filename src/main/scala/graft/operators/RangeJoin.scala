package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval joins at scale.
  *
  * Spark plans `l.ts BETWEEN r.start AND r.end` as a broadcast
  * nested-loop / cartesian theta join: quadratic and undistributable on
  * two large sides. The standard fix: quantize time into fixed bins,
  * explode each interval over the bins it covers, equi-join on the bin
  * (hash shuffle, distributable), then re-check the exact predicate. Bin
  * size trades replication (long intervals → many bins) against join
  * fan-in; results are identical to the theta join (asserted in tests).
  */
object RangeJoin {

  /** Join `points` (with long column `ts`) to `intervals` (with long
    * columns `start`,`end`, inclusive) on containment.
    */
  def binnedPointInInterval(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSize: Long): DataFrame = {
    val p = points.withColumn("__bin", expr(s"$tsCol DIV $binSize"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"$startCol DIV $binSize"), expr(s"$endCol DIV $binSize"))))
    p.join(iv, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** Join `left` (long interval columns `lStart`,`lEnd`) to `right`
    * (`rStart`,`rEnd`) on interval OVERLAP (inclusive ends) — the
    * interval-interval sibling of [[binnedPointInInterval]]. Both sides
    * explode over their bin ranges and meet on the bin equi-key; an
    * overlapping pair shares EVERY bin of the intersection, so to emit
    * it exactly once the join is anchored to the intersection's FIRST
    * bin, `greatest(lStart, rStart) div binSize` (truncating division
    * is monotone, so that bin provably lies in both exploded ranges —
    * no dedup pass needed). Column names must be disjoint across sides.
    */
  def binnedIntervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binSize: Long): DataFrame = {
    val l = left.withColumn("__bin",
      explode(sequence(expr(s"$lStart DIV $binSize"), expr(s"$lEnd DIV $binSize"))))
    val r = right.withColumn("__bin",
      explode(sequence(expr(s"$rStart DIV $binSize"), expr(s"$rEnd DIV $binSize"))))
    l.join(r, Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") ===
        greatest(expr(s"$lStart DIV $binSize"), expr(s"$rStart DIV $binSize")))
      .drop("__bin")
  }
}
