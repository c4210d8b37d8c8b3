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
}
