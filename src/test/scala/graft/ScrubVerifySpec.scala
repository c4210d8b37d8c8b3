package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, EventsOps, TextOps}
import graft.sources.Tables

/** Unit/property coverage for the round-10 scrub-and-verify operators:
  * PII redaction (q144), edit-distance candidate verification (q145),
  * and the median/MAD robust outlier gate (q146). The oracle gate proves
  * cross-engine equality; these specs prove the operator-side CLAIMS —
  * redaction is complete and idempotent, the verifier's distances are
  * the true edit distances, and the doubled order statistics equal a
  * brute-force median/MAD.
  */
class ScrubVerifySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  // --- q144 PII scrub ---

  test("piiScrub redacts known PII shapes and leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "mail me at jane.doe+x@sub.example.org thanks",
      "call +1-555-0134 or visit 192.168.1.17 today",
      "no pii here at all",
      "a@b.io and 10.0.0.1 and +1-800-1234 together").toDF("text")
    val out = TextOps.piiScrub(rows, "text")
      .select("scrubbed", "n_emails", "n_phones", "n_ips")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ("mail me at <EMAIL> thanks", 1L, 0L, 0L))
    assert(out(1) == ("call <PHONE> or visit <IP> today", 0L, 1L, 1L))
    assert(out(2) == ("no pii here at all", 0L, 0L, 0L))
    assert(out(3) == ("<EMAIL> and <IP> and <PHONE> together", 1L, 1L, 1L))
  }

  test("q144 redaction is complete (no residual matches) and idempotent") {
    import spark.implicits._
    val contacts = Tables.customer(spark, sf)
      .select(concat(col("c_name"), lit(" cust"),
        col("c_custkey").cast("string"), lit("@example.com +1-555-0000 10.1.2.3"))
        .as("text"))
    val scrubbed = TextOps.piiScrub(contacts, "text")
      .select(col("scrubbed").as("t1"))
    // residual PII in the scrubbed text would be a redaction failure
    val rescrub = TextOps.piiScrub(scrubbed, "t1")
    assert(rescrub.filter(
      col("n_emails") + col("n_phones") + col("n_ips") > 0).count() == 0L)
    // idempotence: scrubbing a scrubbed row is the identity
    assert(rescrub.filter(col("scrubbed") =!= col("t1")).count() == 0L)
  }

  test("q144 report finds exactly one of each PII class per contact row") {
    val rep = TextOps.piiRedactionReport(spark, sf)
    val agg = rep.agg(
      sum("n_docs"), sum("emails"), sum("phones"), sum("ips")).head
    val (n, e, p, i) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    assert(n > 0 && e == n && p == n && i == n)
    // redaction must strictly shrink every segment's character mass
    // (placeholders are shorter than the synthetic PII they replace)
    assert(rep.filter(col("chars_after") >= col("chars_before")).count() == 0)
  }

  // --- q145 edit-distance verification ---

  /** Reference Levenshtein for the spec (classic DP). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q145 distances are true edit distances over the normalized prefixes") {
    val norm = Tables.documents(spark, sf)
      .select(col("doc_id"),
        substring(lower(regexp_replace(trim(col("text")), "\\s+", " ")),
          1, Dedup.EditVerifyPrefix).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val verified = Dedup.lshEditVerify(spark, sf).collect()
    assert(verified.nonEmpty)
    verified.foreach { r =>
      val (a, b) = (norm(r.getAs[Long]("doc_a")), norm(r.getAs[Long]("doc_b")))
      val expectLev = lev(a, b).toLong
      assert(r.getAs[Long]("lev") == expectLev)
      val lenMax = math.max(1, math.max(a.length, b.length)).toLong
      val expectPpm = (lenMax - expectLev) * 1000000L / lenMax
      assert(r.getAs[Long]("sim_ppm") == expectPpm)
      assert(r.getAs[Boolean]("is_dup") == (expectPpm >= Dedup.EditDupPpm))
    }
  }

  test("q145 verifies exactly the LSH candidate set — no pair added or lost") {
    val cand = Dedup.lshCandidatePairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Dedup.lshEditVerify(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified == cand)
  }

  // --- q146 robust outliers ---

  test("q146 doubled median/MAD equal brute-force order statistics") {
    import graft.operators.Determinism
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), Determinism.cents(col("value")).as("v_c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // brute force: sorted doubled median per the two-middle-positions rule
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length - 1) / 2) + s(s.length / 2)
    }
    val expect = rows.groupBy(_._1).map { case (t, vs) =>
      val v = vs.map(_._2).toSeq
      val m2 = med2(v)
      val dev2 = v.map(x => math.abs(2 * x - m2))
      val mad2 = med2(dev2)
      val nOut = dev2.count(d => 2 * d > EventsOps.MadK * mad2).toLong
      t -> ((v.length.toLong, m2, mad2, nOut))
    }
    val got = EventsOps.valueOutliersMad(spark, sf).collect().map { r =>
      r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("med2_c"),
          r.getAs[Long]("mad2_c"), r.getAs[Long]("n_outliers")))
    }.toMap
    assert(got == expect)
  }

  test("q146 outlier gate is robust: one huge corrupt value does not move the flags") {
    import java.sql.Timestamp
    import spark.implicits._
    // a tight cluster plus one absurd reading, driven through the real
    // operator via a staged events table: mean/stddev gates would let
    // the outlier inflate the threshold; median/MAD must not
    val dir = java.nio.file.Files.createTempDirectory("madspec").toString
    val rows = (1 to 99).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i), i.toLong, "t",
        10.00 + (i % 5) / 100.0, "{}")
    } :+ ((100L, new Timestamp(1700000001000L), 100L, "t", 9999999.99, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = EventsOps.valueOutliersMad(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    // exactly the corrupt reading flags; the cluster's MAD stays tiny
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("med2_c") == 2 * 1002L)
    assert(r.getAs[Long]("mad2_c") <= 8L)
  }
}
