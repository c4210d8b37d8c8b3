package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.quality.PrivacyAudit

/** Hand-computed k-anonymity / l-diversity verdicts (the oracle gate
  * covers the full-table run; this pins the banding arithmetic, the
  * gate thresholds, and the generalization-level semantics).
  */
class PrivacyAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def customers(rows: (Long, Int, String, Double)*) =
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")

  test("level-0 groups: size, diversity, and both gate verdicts") {
    // nation 1 / seg A: 5 rows over 3 distinct $1000 bands → k_ok ∧ l_ok;
    // nation 1 / seg B: 2 rows, 1 band → neither
    val rows = Seq(
      (1L, 1, "A", 10.0), (2L, 1, "A", 1010.0), (3L, 1, "A", 2020.0),
      (4L, 1, "A", 2030.0), (5L, 1, "A", 30.0),
      (6L, 1, "B", 500.0), (7L, 1, "B", 510.0))
    val out = PrivacyAudit.kAnonymityAuditFor(customers(rows: _*))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .toSet
    assert(out.contains((0L, 1L, "A", 5L, 3L, true, true)))
    assert(out.contains((0L, 1L, "B", 2L, 1L, false, false)))
    // level 1 coarsens segment to '*': 7 rows, bands {0,1,2} + {0} → 3
    assert(out.contains((1L, 1L, "*", 7L, 3L, true, true)))
    assert(out.size == 3)
  }

  test("banding is exact floor on negative balances via the offset") {
    // −0.01 → cents −1 → band (−1 + 1e8) DIV 1e5 = 999; 0.00 → 1000.
    // Without the offset a truncating DIV would glue them into one band.
    val out = PrivacyAudit.kAnonymityAuditFor(customers(
      (1L, 1, "A", -0.01), (2L, 1, "A", 0.0)))
      .filter("level = 0").collect()
    assert(out.head.getLong(4) == 2L) // two distinct bands
  }

  test("generalization can repair a failing level-0 group") {
    // each segment alone has 3 rows (< KAnon); pooled at level 1 → 6
    val rows = (1L to 3L).map(i => (i, 1, "A", i * 1000.0)) ++
      (4L to 6L).map(i => (i, 1, "B", i * 1000.0))
    val out = PrivacyAudit.kAnonymityAuditFor(customers(rows: _*))
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(5)))
      .toSet
    assert(out.contains((0L, "A", false)))
    assert(out.contains((0L, "B", false)))
    assert(out.contains((1L, "*", true)))
  }

  /** JVM replay of the q209 draw: trailing zeros of the low 16 bits of
    * the md5-prefix hash, sign from bit 16 — the exact contract the
    * oracle SQL replays.
    */
  private def drawNoise(source: String, lang: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${PrivacyAudit.DpSalt}:$source:$lang"
      .getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fp = java.lang.Long.parseLong(hex.take(12), 16)
    val v = fp % (1L << PrivacyAudit.DpNoiseBits)
    val tz =
      if (v == 0L) PrivacyAudit.DpNoiseBits.toLong
      else java.lang.Long.numberOfTrailingZeros(v).toLong
    if ((fp >> PrivacyAudit.DpNoiseBits) % 2 == 1) tz else -tz
  }

  private def docsOf(rows: (String, String, Int)*) =
    rows.flatMap { case (src, lg, n) =>
      (1 to n).map(i => (i.toLong, "t", lg, src, 1L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q209 noise replays the hash draw per group") {
    val out = PrivacyAudit.dpNoisyCountsFor(
        docsOf(("web", "en", 5), ("web", "de", 3), ("wiki", "en", 7)))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    for (((src, lg), (n, noise, noisy)) <- out) {
      assert(noise == drawNoise(src, lg), s"group ($src, $lg)")
      assert(noisy == math.max(0L, n + noise))
      assert(math.abs(noise) <= PrivacyAudit.DpNoiseBits.toLong)
    }
    assert(out(("web", "en"))._1 == 5L)
  }

  test("q209 release clamps a negative draw at zero") {
    // hunt a group key whose deterministic draw is <= -1, then release
    // a count of 1 under it — the mechanism must clamp, not go negative
    val (src, lg) = (for {
      s <- Iterator.range(0, 200).map(i => s"s$i")
      if drawNoise(s, "en") <= -1L
    } yield (s, "en")).next()
    val out = PrivacyAudit.dpNoisyCountsFor(docsOf((src, lg, 1))).collect()
    assert(out.head.getLong(3) <= -1L)
    assert(out.head.getLong(4) == 0L)
  }
}
