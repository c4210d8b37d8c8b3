package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JsonLake, Tables}

class JsonLakeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  test("jsonl round-trip is value-identical across every escape class") {
    val rows = Seq(
      (1L, "plain ascii", "en", "web", 11L),
      (2L, "quotes \" and 'single' and \\backslash\\", "en", "web", 38L),
      (3L, "newline\nand\ttab and\rcarriage", "en", "books", 28L),
      (4L, "control \u0007 bell and \u001f unit sep", "en", "web", 30L),
      (5L, "unicode: 汉字 éàü ελληνικά русский", "zh", "wiki", 31L),
      (6L, "supplementary: 𝄞 clef 😀 emoji", "en", "web", 26L),
      (7L, "", "de", "web", 0L),
      (8L, "  leading and trailing  ", "fr", "news", 24L),
      (9L, "json-ish: {\"k\": [1, 2]} // not parsed", "en", "code", 37L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec").toString
    JsonLake.writeJsonl(rows, dir)
    val back = JsonLake.readJsonl(spark, dir, JsonLake.DocumentsSchemaDdl)
    assert(back.schema.fieldNames.sorted === rows.schema.fieldNames.sorted)
    val a = rows.as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val b = back.select(col("doc_id"), col("text"), col("lang"), col("source"),
      col("n_chars")).as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(b === a)
  }

  test("q153 audit equals the same aggregate over the parquet source") {
    val viaJson = JsonLake.roundtripAudit(spark, sf)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val direct = Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
        sum(col("n_chars")).as("chars_sum"),
        sum(length(col("text")).cast("long")).as("len_sum"),
        expr(s"bit_xor(${graft.functions.GraftFunctions.Md5PrefixName}(text, 12))")
          .as("text_fp_xor"))
    assert(viaJson.exceptAll(direct).isEmpty && direct.exceptAll(viaJson).isEmpty)
  }
}
