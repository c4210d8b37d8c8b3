package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Row-level set algebra (SURVEY §2.8). The reference uses set algebra
  * only on driver-side metadata (column names, file paths); these are the
  * data-plane equivalents its NL→SQL layer could emit, expressed with
  * Spark's `except`/`intersect`/`union`/`distinct`.
  */
object SetOps {

  private def custkeysWithStatus(spark: SparkSession, dir: String, status: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === status)
      .select(col("o_custkey"))

  /** Customers with an open order but no finished order (EXCEPT). */
  def openNotFinishedCustomers(spark: SparkSession, dir: String): DataFrame =
    custkeysWithStatus(spark, dir, "O").except(custkeysWithStatus(spark, dir, "F"))

  /** Customers with both an open and a finished order (INTERSECT). */
  def openAndFinishedCustomers(spark: SparkSession, dir: String): DataFrame =
    custkeysWithStatus(spark, dir, "O").intersect(custkeysWithStatus(spark, dir, "F"))

  /** Nation keys present on either side of the supply chain (UNION with
    * dedup).
    */
  def activeNationKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").cast("int").as("nationkey"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").cast("int").as("nationkey")))
      .distinct()

  /** Multiset set algebra (q114) — `EXCEPT ALL` / `INTERSECT ALL`, the
    * bag-semantics siblings of q23/q24's distinct forms and distinct
    * physical operators in Spark (no dedup aggregation; multiplicities
    * subtract/min instead). One row per EXCESS open order here, versus
    * q23's one row per customer.
    */
  def multisetOrderCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val open = custkeysWithStatus(spark, dir, "O")
    val fin = custkeysWithStatus(spark, dir, "F")
    open.exceptAll(fin).withColumn("op", lit("except_all"))
      .unionByName(open.intersectAll(fin).withColumn("op", lit("intersect_all")))
  }

  /** Exact dedup on a projection (D1 — the reference's commented-out
    * `dropDuplicates`, promoted to a first-class operator; also the
    * baseline of the north-star dedup family).
    */
  def distinctPartSupp(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .dropDuplicates()
}
