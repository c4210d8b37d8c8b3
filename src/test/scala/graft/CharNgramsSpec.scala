package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The native one-pass n-gram generator must be value-identical to the
  * SQL formulation it replaces in q130:
  * `transform(sequence(1, length(s) - n + 1), i -> substring(s, i, n))`
  * — including codepoint (not byte) indexing for non-ASCII text and
  * empty output for short strings.
  */
class CharNgramsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def both(s: String, n: Int): (Seq[String], Seq[String]) = {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(s).toDF("t").select(
      expr(s"${GraftFunctions.CharNgramsName}(t, $n)").as("native"),
      expr(s"CASE WHEN length(t) >= $n THEN " +
        s"transform(sequence(1, length(t) - $n + 1), i -> substring(t, i, $n)) " +
        "ELSE array() END").as("sql"))
    val r = df.collect()(0)
    (r.getSeq[String](0), r.getSeq[String](1))
  }

  test("native n-grams equal the substring transform on edge shapes") {
    val cases = Seq(
      "abcdef", "abc", "ab", "a", "",
      "aaa aaa", " pad  ded ",
      "héllo wörld",                 // 2-byte UTF-8
      "日本語のテキスト",             // 3-byte UTF-8
      "a😀b😁c", // supplementary (surrogate pairs)
      "mixed 日本 and 🚀 text")
    for (s <- cases; n <- Seq(2, 3, 4)) {
      val (native, sql) = both(s, n)
      assert(native == sql, s"n=$n text=${s.take(30)}")
    }
  }

  test("native n-grams equal the substring transform across the corpus") {
    GraftFunctions.ensureRegistered(spark)
    val rows = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length(col("text")) >= 3)
      .select(
        expr(s"${GraftFunctions.CharNgramsName}(text, 3)").as("native"),
        expr("transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")
          .as("sql"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }
}
