package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** Wide↔long reshaping — the reference's central transform (SURVEY §2.3).
  *
  * `wideToLong` is the engine-level generalization of the reference's
  * `stack` unpivot (`jobs/finance_itsc_pipeline.py:95-113`): value columns
  * are derived as `columns − ids − excluded` (the exact rule tested by the
  * reference in `tests/test_etl.py:149-171`), and null filtering happens
  * *after* stacking, matching the reference's row-drop ordering.
  */
object Reshape {

  /** Generic wide→long unpivot. */
  def wideToLong(
      df: DataFrame,
      idCols: Seq[String],
      excluded: Seq[String] = Nil,
      variableCol: String = "category",
      valueCol: String = "amount"): DataFrame = {
    val valueCols = df.columns.filterNot(c => idCols.contains(c) || excluded.contains(c))
    df.unpivot(
        idCols.map(col).toArray,
        valueCols.map(col).toArray,
        variableCol, valueCol)
      .filter(col(valueCol).isNotNull)
  }

  /** Long→wide pivot (R2 — the implied inverse). Pivot values are pinned
    * explicitly so no extra distinct-values job runs and column order is
    * stable at any scale.
    */
  def pivotByReturnFlag(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(cents(col("l_quantity"))))
      .withColumnsRenamed(Map("A" -> "qty_a_c", "N" -> "qty_n_c", "R" -> "qty_r_c"))
}
