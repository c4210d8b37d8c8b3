package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CsvLake, Tables}

class CsvLakeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("csv round-trip survives separators, quotes, newlines, unicode") {
    val rows = Seq(
      (1L, "plain ascii", "en", "web", 11L),
      (2L, "comma, inside, fields", "en", "web", 21L),
      (3L, "a \"quoted\" fragment", "en", "books", 19L),
      (4L, "line one\nline two\r\nline three", "en", "web", 29L),
      (5L, "unicode: 汉字 éàü ελληνικά", "zh", "wiki", 22L),
      (6L, "trailing separator,", "en", "web", 19L),
      (7L, "", "de", "web", 0L),
      (8L, "  leading and trailing  ", "fr", "news", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    CsvLake.writeCsv(rows, dir)
    val back = CsvLake.readCsv(spark, dir, CsvLake.DocumentsCsvSchemaDdl)
    val a = rows.as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val b = back
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    // CSV has no empty-vs-null distinction for unquoted fields — the
    // read side normalizes the one empty text to "" (doc 7)
    assert(b === a)
  }

  test("q218 audit equals the same aggregate computed without the boundary") {
    val viaCsv = CsvLake.roundtripAudit(spark, sf)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val direct = Tables.documents(spark, sf)
      .withColumn("text", concat(col("text"), lit(CsvLake.HazardSuffix)))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        sum(length(col("text")).cast("long")).as("len_sum"),
        expr(s"bit_xor(${graft.functions.GraftFunctions.Md5PrefixName}(text, 12))")
          .as("text_fp_xor"))
    assert(viaCsv.exceptAll(direct).isEmpty && direct.exceptAll(viaCsv).isEmpty)
  }
}
