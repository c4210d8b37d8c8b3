package graft.lake

/** The exactly-once ingest ledger (reference T2 —
  * `jobs/finance_itsc_pipeline_test_quality.py:40-47`): a source file is
  * *pending* iff neither `<file>.done` nor `<file>.failed` exists.
  * `.done` is written only after a successful atomic commit; `.failed`
  * quarantines a poison-pill file forever (never retried).
  */
class Markers(fsOps: LakeFs) {

  def pending(files: Seq[String]): Seq[String] = {
    val set = files.toSet
    files.filter(f =>
      f.endsWith(".csv") &&
        !set.contains(f + ".done") && !set.contains(f + ".failed") &&
        !fsOps.exists(f + ".done") && !fsOps.exists(f + ".failed"))
  }

  /** Pending files of a raw zone, grouped by year, years sorted — the
    * reference's unit of work (T3,
    * `jobs/finance_itsc_pipeline_test_quality.py:57-72`). Files without a
    * `year=NNNN` path component are skipped, matching the reference.
    */
  def pendingByYear(rawDir: String): Seq[(Int, Seq[String])] =
    pending(fsOps.lsRecursive(rawDir))
      .flatMap(f => LakeFs.extractYearFromPath(f).map(_ -> f))
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toSeq
      .sortBy(_._1)

  def markDone(file: String): Unit = fsOps.touch(file + ".done")
  def markFailed(file: String): Unit = fsOps.touch(file + ".failed")
}
