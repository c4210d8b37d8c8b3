package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-atomic partition commit via the swap pattern (reference X2 —
  * `jobs/utils/retry.py:63-165`, crash matrix `README.md:247-281`):
  *
  *  1. write the partition's data to `<table>/year=Y_tmp`
  *  2. if `<table>/year=Y` exists, rename it to `year=Y_old` (backup)
  *  3. rename `year=Y_tmp` → `year=Y` (the commit point; HDFS rename is
  *     atomic)
  *  4. sync the metastore partition if the table is registered
  *  5. delete `year=Y_old`
  *
  * Failure handling matches the reference exactly: a failed step-3 rename
  * rolls the backup back (`jobs/utils/retry.py:154-157`); any failure
  * before the commit point deletes the `_tmp` dir; `repair()` reaps
  * leftover `_tmp`/`_old` dirs from crashed runs. Other partitions are
  * never touched. This is deliberately NOT Spark's dynamic partition
  * overwrite: that is not crash-atomic across the metastore sync, and the
  * explicit protocol is unit-testable against an injected filesystem.
  */
/** Raised when a second committer races an in-flight commit on the same
  * table directory — the caller must back off / retry, never proceed:
  * proceeding is silent last-writer-wins with possible `_old` orphans.
  */
class ConcurrentCommitException(tableDir: String, holder: String)
  extends IllegalStateException(
    s"concurrent commit on $tableDir — lease held by $holder")

object AtomicPartitionWriter {
  /** Commit-lease time-to-live: a lease older than this belongs to a
    * crashed committer (a live one holds it for one staging+swap
    * sequence, minutes at most) and is stolen. Kept generous — stealing
    * a LIVE committer's lease reintroduces the race this guard exists
    * to close.
    */
  val LeaseTtlMs: Long = 15L * 60L * 1000L
}

class AtomicPartitionWriter(fsOps: LakeFs, spark: SparkSession) {

  def partitionPath(tableDir: String, year: Int, suffix: String = ""): String =
    s"$tableDir/year=$year$suffix"

  private def leasePath(tableDir: String) = s"$tableDir/_commit_lease"

  /** Exclusive commit lease over `tableDir` for the duration of `body` —
    * the single-writer guard for the whole swap protocol. Two committers
    * racing the same table previously interleaved silently: both staged
    * into the SAME `_tmp` path (torn staging), and the loser's `_old`
    * backup could orphan. Now the second committer fails fast with
    * [[ConcurrentCommitException]].
    *
    * The lease is an atomic create-if-absent file ([[LakeFs
    * .createExclusive]]) recording the holder's app id; it is released
    * in a `finally`, so an in-process failure (the crash matrix's
    * injected faults) never leaks it. A PROCESS-kill crash does leak
    * it — past [[AtomicPartitionWriter.LeaseTtlMs]] the next committer
    * (and [[repair]]) treats it as litter and steals/reaps it.
    */
  def withCommitLease[T](tableDir: String)(body: => T): T = {
    val lp = leasePath(tableDir)
    val owner = s"""{"app":"${spark.sparkContext.applicationId}",""" +
      s""""ts":${System.currentTimeMillis()}}"""
    def tryAcquire(): Boolean = fsOps.createExclusive(lp, owner)
    var acquired = tryAcquire()
    if (!acquired) {
      val age =
        try System.currentTimeMillis() - fsOps.fs.getFileStatus(
          new org.apache.hadoop.fs.Path(lp)).getModificationTime
        catch { case _: java.io.IOException => Long.MaxValue } // gone: retry
      if (age > AtomicPartitionWriter.LeaseTtlMs) {
        fsOps.delete(lp)
        acquired = tryAcquire()
      }
    }
    if (!acquired) {
      val holder = try fsOps.readString(lp) catch {
        case _: java.io.IOException => "<unreadable>"
      }
      throw new ConcurrentCommitException(tableDir, holder)
    }
    try body finally fsOps.delete(lp)
  }

  /** Write `df` as the new content of partition `year=Y` of `tableDir`.
    * Returns the committed partition path.
    */
  def write(df: DataFrame, tableDir: String, year: Int,
      table: Option[String] = None): String = withCommitLease(tableDir) {
    val tmp = partitionPath(tableDir, year, "_tmp")
    val fin = partitionPath(tableDir, year)
    val old = partitionPath(tableDir, year, "_old")
    try {
      df.write.mode("overwrite").parquet(tmp)
      swap(tmp, fin, old)
      // metastore sync BEFORE deleting the backup: a crash during the
      // sync must leave `_old` for recovery (crash-matrix contract)
      table.foreach(syncMetastore(_, tableDir, year))
      if (fsOps.exists(old)) fsOps.delete(old)
      fin
    } catch {
      case e: Throwable =>
        if (fsOps.exists(tmp)) fsOps.delete(tmp)
        throw e
    }
  }

  /** The same swap protocol for an arbitrary `col=value` partition
    * directory (no metastore sync — callers with a registered table use
    * [[write]]). The `_tmp`/`_old` suffix discipline is shared, so
    * [[repair]] reaps crashed runs of EITHER entry point. Used by the
    * curation endgame to commit `split=train/val/test` atomically.
    */
  def writePartitionDir(df: DataFrame, tableDir: String,
      partDir: String): String = withCommitLease(tableDir) {
    val tmp = s"$tableDir/${partDir}_tmp"
    val fin = s"$tableDir/$partDir"
    val old = s"$tableDir/${partDir}_old"
    try {
      df.write.mode("overwrite").parquet(tmp)
      swap(tmp, fin, old)
      if (fsOps.exists(old)) fsOps.delete(old)
      fin
    } catch {
      case e: Throwable =>
        if (fsOps.exists(tmp)) fsOps.delete(tmp)
        throw e
    }
  }

  /** Commit a WHOLE partitioned relation atomically per partition:
    * `df` is written ONCE via `partitionBy(partCol)` into a `_tmp`
    * staging dir (one pipeline evaluation however many partitions
    * exist — per-partition [[writePartitionDir]] calls would recompute
    * the upstream once per partition), then every staged
    * `partCol=value` directory is swapped into place through the same
    * backup-rename protocol. Atomicity is PER PARTITION, as with every
    * other entry point here: a crash mid-commit leaves each partition
    * either old or new plus `_tmp`/`_old` litter that [[repair]] reaps
    * (the staging dir's `_tmp` suffix makes it reapable too).
    *
    * The commit REPLACES the table: pre-existing `partCol=value`
    * directories absent from the new relation are removed after every
    * swap lands (a shrinking re-commit must not leave a previous
    * commit's partitions mixed in — e.g. a hash shard that became
    * empty). A crash between the swaps and this sweep leaves the stale
    * dirs readable-but-old; the next successful commit removes them.
    * Returns committed paths keyed by partition value.
    */
  def commitPartitioned(df: DataFrame, tableDir: String,
      partCol: String): Map[String, String] = withCommitLease(tableDir) {
    val staging = s"$tableDir/${partCol}_stage_tmp"
    try {
      df.write.mode("overwrite").partitionBy(partCol).parquet(staging)
      val parts = fsOps.fs
        .listStatus(new org.apache.hadoop.fs.Path(staging))
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith(s"$partCol="))
        .sorted
      val committed = parts.map { p =>
        val fin = s"$tableDir/$p"
        swap(s"$staging/$p", fin, s"$tableDir/${p}_old")
        if (fsOps.exists(s"$tableDir/${p}_old")) fsOps.delete(s"$tableDir/${p}_old")
        p.stripPrefix(s"$partCol=") -> fin
      }.toMap
      val newSet = parts.toSet
      fsOps.fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(n => n.startsWith(s"$partCol=") && !newSet.contains(n) &&
          !n.endsWith("_old") && !n.endsWith("_tmp"))
        .foreach(n => fsOps.delete(s"$tableDir/$n"))
      committed
    } finally {
      if (fsOps.exists(staging)) fsOps.delete(staging)
    }
  }

  /** [[commitPartitioned]]'s UPSERT twin: stage `df` once via
    * `partitionBy(partCol)` and swap each staged partition into place —
    * but partitions ABSENT from `df` are left untouched (no
    * removal sweep). This is the delta-commit primitive: an incremental
    * ingest rewrites only the partitions that received new rows, paying
    * IO proportional to the touched mass instead of the table. Same
    * lease, same per-partition atomicity, same `_tmp`/`_old` litter
    * discipline ([[repair]] reaps a crashed run's leftovers; a crash
    * mid-upsert leaves each partition either old or new — callers
    * needing all-or-nothing visibility must version-gate readers, as
    * [[graft.operators.AnnIndex]] does with its sidecar).
    */
  def upsertPartitions(df: DataFrame, tableDir: String,
      partCol: String): Map[String, String] = withCommitLease(tableDir) {
    val staging = s"$tableDir/${partCol}_stage_tmp"
    try {
      df.write.mode("overwrite").partitionBy(partCol).parquet(staging)
      fsOps.fs
        .listStatus(new org.apache.hadoop.fs.Path(staging))
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith(s"$partCol="))
        .sorted
        .map { p =>
          val fin = s"$tableDir/$p"
          swap(s"$staging/$p", fin, s"$tableDir/${p}_old")
          if (fsOps.exists(s"$tableDir/${p}_old"))
            fsOps.delete(s"$tableDir/${p}_old")
          p.stripPrefix(s"$partCol=") -> fin
        }.toMap
    } finally {
      if (fsOps.exists(staging)) fsOps.delete(staging)
    }
  }

  /** The rename dance with rollback (reference `_hdfs_swap`,
    * `jobs/utils/retry.py:130-165`).
    */
  private[lake] def swap(tmp: String, fin: String, old: String): Unit = {
    val hadBackup = fsOps.exists(fin)
    if (hadBackup) {
      if (fsOps.exists(old)) fsOps.delete(old) // stale backup from a crash
      if (!fsOps.rename(fin, old))
        throw new IllegalStateException(s"backup rename failed: $fin -> $old")
    }
    if (!fsOps.rename(tmp, fin)) {
      // rollback: restore the backup before surfacing the failure
      if (hadBackup) fsOps.rename(old, fin)
      throw new IllegalStateException(s"commit rename failed: $tmp -> $fin")
    }
  }

  /** Metastore partition sync (reference `jobs/utils/retry.py:110-111`).
    * Overridable so the crash matrix can kill the run between the commit
    * rename and the ALTER TABLE (SURVEY §7.5 risk 1).
    */
  protected def syncMetastore(table: String, tableDir: String, year: Int): Unit =
    Catalog.syncPartition(spark, table, tableDir, year)

  /** Reap `_tmp`/`_old` leftovers from crashed runs (reference
    * `jobs/utils/retry.py:144-165`): `_tmp` is always garbage; `_old` is
    * garbage only when the committed partition exists.
    */
  def repair(tableDir: String): Seq[String] = {
    if (!fsOps.exists(tableDir)) return Seq.empty // fresh lake root: nothing to reap
    val status = fsOps.fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
    val now = System.currentTimeMillis()
    val reaped = status.filter { s =>
      val name = s.getPath.getName
      name.endsWith("_tmp") ||
        (name.endsWith("_old") &&
          fsOps.exists(s.getPath.toUri.getPath.stripSuffix("_old"))) ||
        // a commit lease outliving its TTL belongs to a process-killed
        // committer (in-process failures release in a finally) — litter
        (name == "_commit_lease" &&
          now - s.getModificationTime > AtomicPartitionWriter.LeaseTtlMs)
    }.map(_.getPath.toUri.getPath)
    reaped.foreach(fsOps.delete)
    reaped.toSeq
  }

  /** FS reap + metastore reconciliation for a registered table. A crash
    * between the commit rename and the partition sync leaves the
    * directory live but the catalog without (or with a stale) entry —
    * the one divergence the FS-only [[repair]] cannot see. Reap first so
    * `_tmp`/`_old` litter never enters partition discovery, then let
    * `MSCK REPAIR` re-derive the partition index from the directory
    * layout. Both halves are idempotent, so re-running after a crash
    * mid-repair is safe.
    */
  def repair(tableDir: String, table: String): Seq[String] = {
    val reaped = repair(tableDir)
    Catalog.repair(spark, table)
    reaped
  }
}
