package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Compaction, LakeFs}

/** Compaction: many small files → few right-sized files, atomically,
  * with the sorted layout making per-file min/max stats selective.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def freshLake(): (String, Compaction, LakeFs) = {
    val root = Files.createTempDirectory("graft-compact").toString
    val fs = LakeFs.local()
    (s"$root/t", new Compaction(fs, spark), fs)
  }

  /** 40 tiny files in year=2024 via repartition(40). */
  private def seedSmallFiles(tableDir: String): Unit =
    spark.range(0, 20000)
      .select(col("id").as("user_id"),
        (col("id") * 7919 % 1000).as("v"))
      .repartition(40)
      .write.mode("overwrite").parquet(s"$tableDir/year=2024")

  test("plan inventories partitions from listing metadata") {
    val (t, c, _) = freshLake()
    seedSmallFiles(t)
    val plans = c.plan(t, targetBytes = 1L << 30)
    assert(plans.size == 1)
    assert(plans.head.nFiles == 40)
    assert(plans.head.targetFiles == 1)
    assert(plans.head.worthCompacting)
  }

  test("compaction rewrites to the planned file count, same rows") {
    val (t, c, fs) = freshLake()
    seedSmallFiles(t)
    val before = spark.read.parquet(s"$t/year=2024")
      .agg(count(lit(1)), sum("v")).first()
    c.compactYear(t, 2024, targetBytes = 1L << 30)
    val files = fs.lsRecursive(s"$t/year=2024").filter(_.endsWith(".parquet"))
    assert(files.size == 1, s"expected 1 file, got ${files.size}")
    val after = spark.read.parquet(s"$t/year=2024")
      .agg(count(lit(1)), sum("v")).first()
    assert(before == after)
    // no _tmp/_old leftovers: the swap completed
    assert(!fs.exists(s"$t/year=2024_tmp") && !fs.exists(s"$t/year=2024_old"))
  }

  test("scheme-qualified tableDir compacts the same partition") {
    val (t, c, fs) = freshLake()
    seedSmallFiles(t)
    // file:-qualified URI must resolve to the same partition as the bare
    // path (the plan's partition field is scheme-stripped for comparison)
    val p = c.compactYear(s"file:$t", 2024, targetBytes = 1L << 30)
    assert(p.nFiles == 40)
    val files = fs.lsRecursive(s"$t/year=2024").filter(_.endsWith(".parquet"))
    assert(files.size == 1)
  }

  test("sorted layout yields near-disjoint per-file user_id ranges") {
    val (t, c, fs) = freshLake()
    seedSmallFiles(t) // user_id scattered across all 40 files
    // force 4 output files regardless of byte size to observe the ranges
    val bytes = fs.lsRecursive(s"$t/year=2024").filter(_.endsWith(".parquet"))
      .map(f => fs.fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    c.compactYear(t, 2024, targetBytes = bytes / 4, sortCols = Seq("user_id"))
    val ranges = spark.read.parquet(s"$t/year=2024")
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length >= 2)
    // range-partitioned: consecutive files must not interleave
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"file ranges overlap: $ranges")
      case _ =>
    }
  }

  test("targetFilesFor is exact ceil-div with the min-1 floor") {
    for (total <- Seq(0L, 1L, 1023L, 1024L, 1025L, 4096L, 4097L))
      assert(Compaction.targetFilesFor(total, 1024L) ===
        math.max(1L, math.ceil(total / 1024.0).toLong),
        s"total=$total")
  }

  test("q156 audit listing agrees with the filesystem and the data") {
    val sf = "/root/testdata/sf0.001"
    val audit = Compaction.planRowsAudit(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(audit.nonEmpty)
    // rows per year must equal a direct read of the staged table, files
    // must match an independent recursive listing, and the plan must
    // replay the shared law
    val tableDir = Compaction.q156StagingDir(spark, sf)
    val fs = LakeFs.local()
    val byYear = spark.read.parquet(tableDir)
      .groupBy(col("year").cast("long").as("year")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    audit.foreach { case (year, nFiles, nRows, target) =>
      assert(nRows === byYear(year), s"year $year row count")
      val listed = fs.lsRecursive(s"$tableDir/year=$year")
        .count(_.endsWith(".parquet"))
      assert(nFiles === listed.toLong, s"year $year file count")
      assert(target === Compaction.targetFilesFor(nRows, Compaction.RowsPerFileTarget))
    }
  }

  test("q216 executed compaction hits the row-law width and keeps content") {
    val sf = "/root/testdata/sf0.001"
    val out = Compaction.execRowsAudit(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(out.nonEmpty)
    // independent content expectation straight from the source table
    val expect = graft.sources.Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(o_orderkey)").as("x"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val fs = LakeFs.local()
    val tableDir = Compaction.q216StagingDir(spark, sf)
    out.foreach { case (y, before, nRows, target, after, nAfter, xor) =>
      assert(before > after, s"year $y must shrink")
      assert(after === target && target ===
        Compaction.targetFilesFor(nRows, Compaction.RowsPerFileTarget))
      assert((nRows, xor) === ((expect(y)._1, expect(y)._2)), s"year $y content")
      assert(nAfter === nRows, s"year $y rows preserved")
      // the real listing agrees and no _tmp/_old residue remains
      val listed = fs.lsRecursive(s"$tableDir/year=$y")
        .count(_.endsWith(".parquet"))
      assert(listed.toLong === after, s"year $y listing")
      assert(!fs.exists(s"$tableDir/year=${y}_tmp"))
      assert(!fs.exists(s"$tableDir/year=${y}_old"))
    }
  }
}
