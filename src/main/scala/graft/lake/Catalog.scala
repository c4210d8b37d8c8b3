package graft.lake

import org.apache.spark.sql.SparkSession

/** Catalog registration for the lake's partitioned Parquet tables
  * (reference S6/S8/S9 — `saveAsTable` at an external location,
  * `MSCK REPAIR TABLE`, `ALTER TABLE ADD/DROP PARTITION`): the queryable
  * name over the directory layout the [[AtomicPartitionWriter]] commits
  * into. Partition pruning on `year` then comes from the catalog's
  * partition index rather than file listing.
  */
object Catalog {

  /** Register (or replace) `table` over an existing partitioned Parquet
    * dir and discover its partitions (S6 + S8). Spark requires an
    * explicit column list with PARTITIONED BY + LOCATION, so the schema
    * is inferred from the data once at registration.
    */
  def registerPartitionedParquet(
      spark: SparkSession, table: String, dir: String,
      partitionCol: String = "year"): Unit = {
    val full = spark.read.parquet(dir).schema
    val ordered = org.apache.spark.sql.types.StructType(
      full.filterNot(_.name == partitionCol) :+ full(partitionCol))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"CREATE TABLE $table (${ordered.toDDL}) USING PARQUET " +
        s"PARTITIONED BY ($partitionCol) LOCATION '$dir'")
    repair(spark, table)
  }

  /** `MSCK REPAIR TABLE` (S8 — reference `jobs/finance_pipeline.py:60`). */
  def repair(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  /** Explicit partition registration (S9 — reference
    * `jobs/utils/retry.py:110-111`), used by the atomic writer's
    * metastore sync.
    */
  def syncPartition(spark: SparkSession, table: String, dir: String, year: Int): Unit = {
    spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (year=$year)")
    spark.sql(
      s"ALTER TABLE $table ADD PARTITION (year=$year) LOCATION '$dir/year=$year'")
  }
}
