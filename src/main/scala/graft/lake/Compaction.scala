package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction + sort-order layout for lake partitions — the
  * maintenance half of a 100 TB lakehouse. Streaming and incremental
  * commits accumulate many small parquet files per partition; scan cost
  * then tracks file COUNT (task scheduling, footer reads, no intra-file
  * locality), not data size. Compaction rewrites a partition into
  * ~`targetBytes` files, optionally range-partitioned and sorted on a
  * key so parquet min/max stats become selective (the "z-order lite"
  * single-dimension layout); the rewrite commits through
  * [[AtomicPartitionWriter]], so readers never see a half-compacted
  * partition and a crashed compaction rolls back.
  *
  * Scale design: planning is pure file-listing metadata; each
  * partition's rewrite is an independent job (parallelize across
  * partitions on the driver as needed), and the sorted layout uses
  * `repartitionByRange` + `sortWithinPartitions` — a sampled range
  * exchange, never a single-task global sort.
  */
class Compaction(fs: LakeFs, spark: SparkSession) {

  /** Per-partition compaction need, from listing metadata only. */
  final case class PartitionPlan(
      partition: String, nFiles: Int, totalBytes: Long, targetFiles: Int) {
    def worthCompacting: Boolean = nFiles > targetFiles
  }

  /** Inventory `tableDir`'s `<col>=<value>` partitions and size each
    * one's rewrite as ceil(bytes / targetBytes) files (min 1).
    */
  def plan(tableDir: String, targetBytes: Long): Seq[PartitionPlan] = {
    if (!fs.exists(tableDir)) return Seq.empty
    fs.fs.listStatus(new Path(tableDir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .filterNot(s => s.getPath.getName.endsWith("_tmp") ||
        s.getPath.getName.endsWith("_old"))
      .map(s => planPartition(s.getPath.toUri.getPath, targetBytes))
      .sortBy(_.partition)
  }

  /** Size ONE partition directory's rewrite — listing metadata only.
    * `partition` in the result is scheme-stripped (`toUri.getPath`), so
    * plans compare equal whether the caller passed `hdfs://nn/t` or
    * `/t`.
    */
  def planPartition(partDir: String, targetBytes: Long): PartitionPlan = {
    val dataFiles = fs.lsRecursive(partDir).filter(_.endsWith(".parquet"))
    val bytes = dataFiles.map(f => fs.fs.getFileStatus(new Path(f)).getLen).sum
    PartitionPlan(
      new Path(partDir).toUri.getPath, dataFiles.size, bytes,
      math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt))
  }

  /** Rewrite one year partition into `targetFiles(plan)` files, sorted
    * within each output file by `sortCols` when given (range-partitioned
    * across files, so per-file min/max are near-disjoint and a filter on
    * the sort key prunes whole files). Commits via the atomic swap.
    */
  def compactYear(tableDir: String, year: Int, targetBytes: Long,
      sortCols: Seq[String] = Nil, table: Option[String] = None): PartitionPlan = {
    // Size only the target partition (not a full-table listing), and go
    // through Path so a scheme-qualified tableDir (hdfs://nn/t) works.
    val part = s"$tableDir/year=$year"
    if (!fs.exists(part))
      throw new IllegalArgumentException(s"no partition $part")
    val p = planPartition(part, targetBytes)
    val df = spark.read.parquet(part)
    val laidOut =
      if (sortCols.isEmpty) df.repartition(p.targetFiles)
      else df
        .repartitionByRange(p.targetFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    new AtomicPartitionWriter(fs, spark).write(laidOut, tableDir, year, table)
    p
  }
}
