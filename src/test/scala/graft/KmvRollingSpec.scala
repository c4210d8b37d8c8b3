package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** q214's sliding sketch merge against a JVM replay: the per-window
  * merged sketch must equal the sketch built directly over the
  * window's raw hash set (the min-k merge law), and the estimator
  * must follow the (k−1)·2³²/h_k contract exactly.
  */
class KmvRollingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private val dayNs = 86400000000000L

  private def ev(rows: (Long, Long)*) =
    rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, u, d * dayNs + 500L, "view", 0.0)
    }.toDF("event_id", "user_id", "ts_ns", "event_type", "value")

  private def hash32(u: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  /** Direct sketch over a window's raw user set. */
  private def directSketch(users: Set[Long]): (Long, Long, Long) = {
    val k = Sketches.KmvRollK
    val hs = users.map(hash32).toSeq.sorted.take(k)
    val (nKept, hK) = (hs.size.toLong, hs.last)
    val est = if (nKept < k) nKept else (nKept - 1) * 4294967296L / hK
    (nKept, hK, est)
  }

  test("saturated windows: merged day-sketches equal the direct sketch") {
    // 100 users day 0, 10 more day 1 — both windows saturate k = 64
    val rows = (1L to 100L).map(u => (u, 0L)) ++
      (101L to 110L).map(u => (u, 1L))
    val out = Sketches.kmvRollingActivesFor(ev(rows: _*))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(6))))
      .toMap
    assert(out.keySet == Set(0L, 1L))
    val d0 = directSketch((1L to 100L).toSet)
    val d1 = directSketch((1L to 110L).toSet)
    assert(out(0L) == ((100L, d0._1, d0._2, d0._3, out(0L)._5)))
    assert(out(1L) == ((110L, d1._1, d1._2, d1._3, out(1L)._5)))
  }

  test("undersized sketch is exact: est = n, err 0, audit green") {
    val out = Sketches.kmvRollingActivesFor(
        ev((1L, 0L), (2L, 0L), (3L, 0L)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(4) == 3L)
    assert(r.getLong(5) == 0L && r.getBoolean(6))
  }
}
