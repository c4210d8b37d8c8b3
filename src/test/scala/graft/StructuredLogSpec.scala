package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._
import graft.util.StructuredLog

/** X6 logging parity (ref `jobs/logger.py:30-71`): JSON main file
  * (INFO+), separate ERROR file, size rotation with zip compression,
  * age-based retention — and the e2e case the whole feature exists for:
  * a pipeline failure lands structured in the error log.
  */
class StructuredLogSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  private def tmp() = Files.createTempDirectory("graft-slog").toString

  private def readJson(path: java.nio.file.Path) =
    spark.read.json(path.toString)

  test("levels route correctly: INFO+ to main file, ERROR also to error file") {
    val dir = tmp()
    val log = StructuredLog.setup("app", dir)
    try {
      log.debug("mod", "debug line", "k" -> 1)
      log.info("mod", "ingest started", "rows" -> 1000, "file" -> "finance_2024.csv")
      log.warn("mod", "late file")
      log.error("mod", "boom", "year" -> 2024)
      // the ledger is queryable by the engine itself
      val main = readJson(log.mainFile).collect()
      assert(main.length == 3, "debug must not reach the JSON file")
      val levels = main.map(_.getAs[String]("level")).sorted.toSeq
      assert(levels == Seq("ERROR", "INFO", "WARN"))
      val info = main.find(_.getAs[String]("level") == "INFO").get
      assert(info.getAs[String]("module") == "mod")
      assert(info.getAs[String]("message") == "ingest started")
      val err = readJson(log.errorFile).collect()
      assert(err.length == 1 && err.head.getAs[String]("message") == "boom")
    } finally StructuredLog.reset()
  }

  test("size rotation compresses segments to zip; live file restarts") {
    val dir = tmp()
    val log = StructuredLog.setup("rot", dir, fileMaxBytes = 400)
    try {
      (1 to 30).foreach(i => log.info("mod", s"record $i", "i" -> i))
      val segments = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("rot.log.") && f.getName.endsWith(".zip"))
      assert(segments.nonEmpty, "rotation must have produced zip segments")
      assert(Files.size(log.mainFile) < 800, "live file must have restarted")
      // a rotated segment holds the earlier JSON lines, zip-compressed
      val zin = new java.util.zip.ZipInputStream(
        new java.io.FileInputStream(segments.minBy(_.getName)))
      assert(zin.getNextEntry.getName == "rot.log")
      val content = new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      zin.close()
      assert(content.contains("\"record 1\""))
    } finally StructuredLog.reset()
  }

  test("retention sweeps rotated segments past their age, never the live file") {
    val dir = tmp()
    var now = 1000000000L
    val log = StructuredLog.setup("ret", dir, fileMaxBytes = 200,
      retentionMillis = 10 * StructuredLog.DayMillis, clock = () => now)
    try {
      (1 to 10).foreach(i => log.info("mod", s"old $i"))
      val oldSegs = new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".zip"))
      assert(oldSegs > 0)
      // file mtimes are real wall-clock; age the segments on disk to
      // match the advanced logical clock
      now += 11 * StructuredLog.DayMillis
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip"))
        .foreach(f => f.setLastModified(now - 11 * StructuredLog.DayMillis))
      log.info("mod", "new record")
      val left = new java.io.File(dir).listFiles().count(_.getName.endsWith(".zip"))
      assert(left == 0, "aged segments must be swept")
      assert(Files.exists(log.mainFile))
    } finally StructuredLog.reset()
  }

  test("pipeline failure lands structured in the error log") {
    val dir = tmp()
    StructuredLog.setup("pipe", dir)
    try {
      val base = Files.createTempDirectory("graft-slog-pipe").toString
      val cfg = FinancePipeline.Config(
        rawDir = s"$base/raw", stagingDir = s"$base/staging",
        curatedDir = s"$base/curated", versionsRoot = s"$base/versions",
        keepVersions = 2)
      val fs = LakeFs.local()
      fs.mkdirs(cfg.rawDir)
      // null date row → fatal DQ → quarantine path
      fs.writeString(s"${cfg.rawDir}/year=2023/finance_2023.csv",
        """date,details,total_amount,wifi
          |,budget,1000,400
          |2023-10,spent,100,40""".stripMargin)
      val pipe = new FinancePipeline(spark, fs, cfg, alert = (_, _) => ())
      val results = pipe.run()
      assert(results.map(_.committed) == Seq(false))
      val errs = readJson(Paths.get(dir).resolve("pipe.error.log")).collect()
      assert(errs.length == 1)
      assert(errs.head.getAs[String]("level") == "ERROR")
      assert(errs.head.getAs[String]("message").contains("DQ fatal failure"))
      val extra = errs.head.getAs[org.apache.spark.sql.Row]("extra")
      assert(extra.getAs[Long]("year") == 2023L)
      // the INFO ledger saw the year start, then the failure
      val main = readJson(Paths.get(dir).resolve("pipe.log")).collect()
      assert(main.exists(_.getAs[String]("message") == "processing year"))
    } finally StructuredLog.reset()
  }
}
