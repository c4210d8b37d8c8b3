package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, TextOps}

/** Hand fixtures for the q186 temperature mix and q187 quantile
  * normalization (the oracle gate covers the full-table runs; these
  * pin the exact-integer algebra and the calibration semantics).
  */
class MixCalibrationSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def docsWithTokens(rows: (String, Int)*) =
    rows.zipWithIndex.map { case ((lang, nTok), i) =>
      (i.toLong, lang, Seq.fill(nTok)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")

  test("temperature mix: tau=1/2 shares and boosts on a hand corpus") {
    // lang a: 100 tokens, lang b: 400 → sqrt 10 vs 20
    val m = Sampling.temperatureMixFor(
      docsWithTokens(("a", 100), ("b", 400)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m("a") == ((100L, 200000L, 333333L, 1666665L)))
    assert(m("b") == ((400L, 800000L, 666666L, 833332L)))
  }

  test("temperature mix compresses: boost ordering inverts share ordering") {
    val m = Sampling.temperatureMixFor(
      docsWithTokens(("a", 9), ("b", 100), ("c", 900)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5))).toMap
    // temp shares preserve the size ordering, boosts invert it
    assert(m("a")._1 < m("b")._1 && m("b")._1 < m("c")._1)
    assert(m("a")._2 > m("b")._2 && m("b")._2 > m("c")._2)
    // low-resource up-boosted, dominant down-boosted
    assert(m("a")._2 > 1000000L && m("c")._2 < 1000000L)
  }

  private def docsWithChars(rows: (String, Long)*) =
    rows.zipWithIndex.map { case ((source, n), i) => (i.toLong, source, n) }
      .toDF("doc_id", "source", "n_chars")

  test("quantile normalize: distinct scores spread one per decile") {
    val rows = (1L to 10L).map(n => ("s", n * 100))
    val out = TextOps.quantileNormalizeFor(docsWithChars(rows: _*))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // below·1e6 DIV 9 steps 0,111111,...,999999 → one doc per decile
    // except deciles sharing a floor boundary
    assert(out.values.map(_._1).sum == 10L)
    assert(out.keySet.max == 9L && out.keySet.min == 0L)
    // score spans are ordered across deciles
    val spans = out.toSeq.sortBy(_._1).map(_._2)
    spans.sliding(2).foreach { case Seq((_, _, hi), (_, lo, _)) =>
      assert(hi <= lo)
    case _ => ()
    }
  }

  test("quantile normalize: an all-tied source collapses to decile 0") {
    val out = TextOps.quantileNormalizeFor(
      docsWithChars(Seq.fill(7)(("t", 42L)): _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 0L && r.getLong(2) == 7L &&
      r.getLong(3) == 42L && r.getLong(4) == 42L)
  }

  test("q196 epoch overlap replays the salted md5 rule exactly") {
    def md5Bucket(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % Sampling.Buckets
    }
    val ids = (0L until 400L).toSeq
    def mem(salt: String) =
      ids.map(i => md5Bucket(s"$i$salt") < Sampling.EpochRatePpm)
    val (m1, m2) = (mem("#e1"), mem("#e2"))
    val n1 = m1.count(identity).toLong
    val n2 = m2.count(identity).toLong
    val n12 = m1.zip(m2).count { case (a, b) => a && b }.toLong
    val docs = ids.toDF("doc_id")
    val r = Sampling.epochOverlapFor(docs).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((400L, n1, n2, n12)))
    assert(r.getLong(4) == n12 * 1000000L / 400L)
    assert(r.getLong(5) ==
      (n1 * 1000000L / 400L) * (n2 * 1000000L / 400L) / 1000000L)
    assert(r.getLong(6) == r.getLong(4) - r.getLong(5))
  }

  test("quantile normalize calibrates sources independently") {
    // source A: scores 1..4; source B: scores 1001..1004 — identical
    // decile layout despite disjoint raw scales
    val rows = (1L to 4L).map(n => ("A", n)) ++
      (1001L to 1004L).map(n => ("B", n))
    val out = TextOps.quantileNormalizeFor(docsWithChars(rows: _*))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val a = out.collect { case (("A", d), n) => d -> n }
    val b = out.collect { case (("B", d), n) => d -> n }
    assert(a == b)
  }
}
