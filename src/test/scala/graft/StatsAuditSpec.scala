package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatsAudit

/** Hand-computed CUSUM and Benford fixtures (the oracle gate covers
  * the full-table runs; these pin the scaled-integer arithmetic and
  * the peak/deviation semantics).
  */
class StatsAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def orders(rows: (Long, Double)*) =
    rows.toDF("day", "o_totalprice")
      .select(to_timestamp(col("day") * 86400L).as("o_orderdate"),
        col("o_totalprice"))

  test("CUSUM localizes a level shift at the boundary day") {
    // 4 days at $100 then 4 at $200: C_t = 8·S_t − t·S_8 bottoms at
    // t=4 (−160000 cents·8), C/n = −20000; C_8 = 0
    val rows = (1L to 4L).map(d => (d, 100.0)) ++
      (5L to 8L).map(d => (d, 200.0))
    val out = StatsAudit.revenueCusumFor(orders(rows: _*))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((10000L, -5000L, false)))
    assert(out(4L) == ((10000L, -20000L, true)))
    assert(out(5L) == ((20000L, -15000L, false)))
    assert(out(8L) == ((20000L, 0L, false)))
    assert(out.values.count(_._3) == 1)
  }

  test("CUSUM is flat zero on a constant series") {
    val out = StatsAudit.revenueCusumFor(
      orders((1L to 5L).map(d => (d, 42.0)): _*))
      .collect().map(r => (r.getLong(3), r.getBoolean(4)))
    assert(out.forall { case (c, p) => c == 0L && p }) // all tie at |0|
  }

  test("Benford audit: exact ppm shares and shared expectation constants") {
    val prices = Seq(1.00, 1.50, 1.99, 2.50, 9.99)
    val out = StatsAudit.benfordAuditFor(
      prices.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("l_orderkey", "l_extendedprice"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exp = StatsAudit.BenfordPpm.toMap
    assert(out(1L) == ((3L, 600000L, exp(1), 600000L - exp(1))))
    assert(out(2L) == ((1L, 200000L, exp(2), 200000L - exp(2))))
    assert(out(9L) == ((1L, 200000L, exp(9), 200000L - exp(9))))
    assert(out.size == 3)
    // the constants are the floor'd Benford logs
    assert(exp(1) == 301029L && exp(9) == 45757L)
  }

  test("q215 seasonal residuals: weekday-local medians and MAD flags") {
    // dow 3 (days 0/7/14): median 200 → the 1000 day is >3·MAD out;
    // dow 4 (days 1/8): constant series, zero MAD, never flagged
    val rows = Seq((0L, 100.0), (7L, 200.0), (14L, 1000.0),
      (1L, 50.0), (8L, 50.0))
    val out = StatsAudit.seasonalResidualsFor(orders(rows: _*))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(0L) == ((3L, 10000L, 40000L, -20000L, false)))
    assert(out(7L) == ((3L, 20000L, 40000L, 0L, false)))
    assert(out(14L) == ((3L, 100000L, 40000L, 160000L, true)))
    assert(out(1L) == ((4L, 5000L, 10000L, 0L, false)))
    assert(out(8L) == ((4L, 5000L, 10000L, 0L, false)))
  }

  test("q215 a weekday-normal day is not flagged by another weekday's scale") {
    // global MAD would flag the quiet Sundays; weekday-local must not:
    // dow A runs at ~$10, dow B at ~$1000, both with tiny jitter
    val rows = Seq((0L, 10.0), (7L, 11.0), (14L, 12.0),
      (1L, 1000.0), (8L, 1100.0), (15L, 1200.0))
    val out = StatsAudit.seasonalResidualsFor(orders(rows: _*)).collect()
    assert(out.forall(!_.getBoolean(5)))
  }

  // q185 fixture plumbing: one customer per nation, one order per
  // (nation, month); month index m = y*12 + month - 1
  private def trendFixture(rows: Seq[(Long, Int, Double)]) = {
    val orders = rows.zipWithIndex.map { case ((cust, m, price), i) =>
      (i.toLong, cust, f"${m / 12}%04d-${m % 12 + 1}%02d-15", price)
    }.toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_custkey"), to_timestamp(col("d")).as("o_orderdate"),
        col("o_totalprice"))
    val customer = rows.map(_._1).distinct.map(c => (c, c))
      .toDF("c_custkey", "c_nationkey")
    val nation = rows.map(_._1).distinct.map(c => (c, s"N$c"))
      .toDF("n_nationkey", "n_name")
    StatsAudit.revenueTrendFor(orders, customer, nation)
  }

  test("OLS trend recovers an exact line: slope/intercept exact, r2 = 1e6") {
    // nation 1: y = 100·m + 7 dollars over months 24000..24005
    val rows = (0 to 5).map(i =>
      (1L, 24000 + i, (100.0 * (24000 + i) + 7) * 1.0))
    val r = trendFixture(rows).collect().head
    assert(r.getString(0) == "N1" && r.getLong(1) == 6L)
    assert(r.getLong(3) == 100000000L) // slope 100 dollars/month in ppm
    assert(r.getLong(4) == 7000000L)   // intercept 7 dollars in ppm
    assert(r.getLong(5) == 1000000L)   // perfect fit
  }

  test("OLS trend: negative slope and sub-1e6 r2 on noisy decline") {
    // y = 50 - 10·m + alternating ±1 noise at m = 0..3
    val ys = Seq(51.0, 39.0, 31.0, 19.0) // slope -10.6, r2 < 1e6
    val r = trendFixture(ys.zipWithIndex.map { case (y, m) =>
      (2L, m, y) }).collect().head
    // hand normal equations: n=4 sx=6 sy=140 sxx=14 sxy=158
    // num = 4·158 − 6·140 = -208; den_x = 4·14 − 36 = 20
    assert(r.getLong(3) == (-208L * 1000000L) / 20L)
    val denY = 4L * (51 * 51 + 39 * 39 + 31 * 31 + 19 * 19) - 140L * 140
    assert(r.getLong(5) == ((-208L * 1000000L / 20L) * -208L) / denY)
    assert(r.getLong(5) < 1000000L && r.getLong(5) > 980000L)
  }

  test("OLS trend: single-month nation yields NULL slope, not a crash") {
    val r = trendFixture(Seq((3L, 100, 500.0))).collect().head
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }

  // events fixture for the experimentation pair: (user, day, type, value)
  private def events(rows: (Long, Int, String, Double)*) =
    rows.zipWithIndex.map { case ((u, d, t, v), i) =>
      (i.toLong, u, d.toLong * 86400L * 1000000000L, t, v)
    }.toDF("event_id", "user_id", "ts_ns", "event_type", "value")

  private def md5Bucket(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) %
      1000000L
  }
  private def variantOf(u: Long): String =
    if (md5Bucket(s"$u#ab") < 500000L) "A" else "B"

  test("q201 CUPED: constant outcome gives theta 0 and adj == raw") {
    // day 2 (1970-01-03) is pre (< 15), day 20 (1970-01-21) is post
    val rows = (1L to 6L).flatMap(u => Seq(
      (u, 2, "view", u * 7.0), (u, 20, "view", 50.0)))
    val out = StatsAudit.cupedAdjustFor(events(rows: _*)).collect()
    out.foreach { r =>
      assert(r.getLong(4) == 0L && r.getLong(5) == 0L) // theta, rho2
      assert(r.getLong(2) == r.getLong(3)) // adj == raw
      assert(r.getLong(2) == 5000000000L) // 5000 cents in ppm
    }
  }

  test("q201 CUPED: exact linear outcome is fully explained (rho2 = 1e6)") {
    val rows = (1L to 8L).flatMap(u => Seq(
      (u, 2, "view", u * 10.0), (u, 20, "view", u * 30.0)))
    val out = StatsAudit.cupedAdjustFor(events(rows: _*))
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    out.values.foreach { case (_, theta, rho2) =>
      assert(theta == 3000000L && rho2 == 1000000L)
    }
    // y - theta(x - xbar) = 3*xbar for every user → adjusted means agree
    val adjs = out.values.map(_._1).toSeq
    assert(math.abs(adjs.head - adjs.last) <= 5L)
  }

  test("q202 proportion panel replays the hash split and z2 identity") {
    // conversion = post purchase above ConvertCentsMin
    val rows = (1L to 10L).flatMap { u =>
      val post: (Long, Int, String, Double) =
        if (u % 3 == 0) (u, 20, "purchase", 200.0) // converts
        else (u, 20, "purchase", 10.0)             // too small
      Seq((u, 2, "view", 5.0), post)
    }
    val r = StatsAudit.abProportionTestFor(events(rows: _*)).collect().head
    val users = (1L to 10L)
    val (aU, bU) = users.partition(u => variantOf(u) == "A")
    def conv(us: Seq[Long]) = us.count(_ % 3 == 0).toLong
    val (n1, c1, n2, c2) = (aU.size.toLong, conv(aU), bU.size.toLong, conv(bU))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n1, c1, n2, c2)))
    val (n, c) = (n1 + n2, c1 + c2)
    val num = BigInt(c1 * n2 - c2 * n1)
    val z2 = (num * num * n * 1000000L) /
      (BigInt(n1) * n2 * c * (n - c))
    assert(r.getLong(6) == z2.toLong)
  }

  test("q203 bootstrap: constant daily revenue yields constant resample means") {
    val rows = (1L to 5L).map(d => (d, 250.0))
    val out = StatsAudit.bootstrapMeansFor(orders(rows: _*)).collect()
    assert(out.length == StatsAudit.BootstrapB)
    out.foreach { r =>
      val nEff = r.getLong(1)
      assert(nEff >= 0L && nEff <= 9L * 5L)
      if (!r.isNullAt(2)) assert(r.getLong(2) == 25000L)
    }
    // the CDF constants are the floor'd Poisson(1) values
    assert(StatsAudit.PoissonCdfPpm.head == 367879L)
    assert(StatsAudit.PoissonCdfPpm(1) == 735758L)
  }

  test("q200 band breach: a spike leaves the trailing band, constants never do") {
    // 8 days at $100 (zero-variance windows → NULL z², no breach),
    // then a $200 spike: window {100×6, 200}, z² = 6 > k² = 4
    val rows = (1L to 8L).map(d => (d, 100.0)) :+ ((9L, 200.0))
    val out = StatsAudit.bandBreachFor(orders(rows: _*))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toMap
    (1L to 8L).foreach(d => assert(out(d) == ((None, false)), s"day $d"))
    assert(out(9L) == ((Some(6000000L), true)))
  }

  test("q191 contingency cells: hand-computed phi2 on a 2x2 drift") {
    // 2000: 30 A / 10 B; 2001: 10 A / 30 B → E=20 each, chi2=20,
    // phi2 = 0.25 → per-cell 62500 ppm
    val rows = Seq.fill(30)((2000, "A")) ++ Seq.fill(10)((2000, "B")) ++
      Seq.fill(10)((2001, "A")) ++ Seq.fill(30)((2001, "B"))
    val df = rows.zipWithIndex.map { case ((y, p), i) =>
      (i.toLong, s"$y-06-01", p)
    }.toDF("o_orderkey", "d", "o_orderpriority")
      .select(to_timestamp(col("d")).as("o_orderdate"), col("o_orderpriority"))
    val out = StatsAudit.priorityDriftCellsFor(df)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out((2000L, "A")) == ((30L, 375000L, 250000L, 62500L)))
    assert(out((2000L, "B")) == ((10L, 125000L, 250000L, 62500L)))
    assert(out((2001L, "A")) == ((10L, 125000L, 250000L, 62500L)))
    assert(out((2001L, "B")) == ((30L, 375000L, 250000L, 62500L)))
  }

  test("q191 independence yields zero phi2 cells") {
    val rows = for (y <- Seq(2000, 2001); p <- Seq("A", "B");
      _ <- 1 to (if (p == "A") 6 else 2)) yield (y, p)
    val df = rows.zipWithIndex.map { case ((y, p), i) =>
      (i.toLong, s"$y-06-01", p)
    }.toDF("o_orderkey", "d", "o_orderpriority")
      .select(to_timestamp(col("d")).as("o_orderdate"), col("o_orderpriority"))
    val out = StatsAudit.priorityDriftCellsFor(df).collect()
    assert(out.forall(r => r.getLong(7) == 0L))
  }

  test("OLS trend is invariant to input partitioning") {
    val rows = (0 to 11).map(i => (4L, 24000 + i, 1000.0 + 37 * i))
    val a = trendFixture(rows).collect().toSeq
    val b = trendFixture(rows.reverse).collect().toSeq
    assert(a == b)
  }

  test("q237 mann-whitney: hand-computed U with ties") {
    val spark2 = spark; import spark2.implicits._
    // A = {1, 2, 2}, B = {2, 3}. Joint ranks: 1→1; 2,2,2→avg 3 (2·r=6);
    // 3→5. 2R_A = 2·1 + 6 + 6 = 14; u2_a = 14 − 3·4 = 2 (U_A = 1:
    // pair (2>?) ... A beats B in 0 pairs, ties in 2 → U = 0 + 2/2 = 1)
    // mu2 = 6; ties: t=3 at v=2 → tie_mass = 27 − 3 = 24
    // rank-biserial = 2·1/6 − 1 = −2/3 → u2·1e6 DIV 6 − 1e6 = −666667
    val vals = Seq((true, 1L), (true, 2L), (true, 2L), (false, 2L),
      (false, 3L)).toDF("is_a", "v")
    val r = StatsAudit.mannWhitneyUFor(vals).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 2L, 2L, 6L, 24L, -666667L)))
  }

  test("q237 mann-whitney: identical samples land at zero effect") {
    val spark2 = spark; import spark2.implicits._
    val vals = (1L to 50L).flatMap(v => Seq((true, v), (false, v)))
      .toDF("is_a", "v")
    val r = StatsAudit.mannWhitneyUFor(vals).collect().head
    // u2 = mu2 exactly under symmetry → effect 0
    assert(r.getLong(2) == r.getLong(3))
    assert(r.getLong(5) == 0L)
  }

  test("q239 A/A calibration: splits differ, rejects stay near alpha") {
    val out = StatsAudit.aaCalibration(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getBoolean(6)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until StatsAudit.AaSplits.toLong))
    // every user lands on exactly one side per split
    val total = out.head._2 + out.head._3
    assert(out.forall { case (_, n1, n2, _, _) => n1 + n2 == total })
    // the salted hashes genuinely re-split (not one assignment reused)
    assert(out.map(_._2).distinct.length > 1)
    // null calibration: a healthy stack rejects about alpha*K; allow a
    // generous margin before calling the machinery broken
    assert(out.count(_._5) <= 4, s"A/A rejects inflated: $out")
  }

  test("q238 watermark tuning: hand-computed lateness quantiles") {
    val spark2 = spark; import spark2.implicits._
    // arrival order 1..5 with event times (s): 10, 5, 20, 6, 21 →
    // lateness ms: 0, 5000, 0, 14000, 0. n=5, ooo=2 → 400000 ppm.
    // positions (n−1)·q DIV 100 + 1 over sorted [0,0,0,5000,14000]:
    // p50→3rd=0, p90/p95/p99→4th=5000, p100→5th=14000
    val ev = Seq((7L, 1L, 10L), (7L, 2L, 5L), (7L, 3L, 20L),
      (7L, 4L, 6L), (7L, 5L, 21L))
      .map { case (u, id, s) => (u, id, s * 1000000000L) }
      .toDF("user_id", "event_id", "ts_ns")
    val out = graft.operators.EventsOps.watermarkTuningFor(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out(50L) == ((0L, 5L, 2L, 400000L)))
    assert(out(90L) == ((5000L, 5L, 2L, 400000L)))
    assert(out(99L) == ((5000L, 5L, 2L, 400000L)))
    assert(out(100L) == ((14000L, 5L, 2L, 400000L)))
  }
}
