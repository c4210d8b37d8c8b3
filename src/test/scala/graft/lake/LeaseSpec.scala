package graft.lake

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The commit lease's liveness/safety contract under contention — the
  * two TOCTOU races the round-12 audit flagged, exercised from inside
  * the `graft.lake` package so the swap fence is testable directly:
  *
  *  - concurrent STEAL of a stale lease admits exactly one stealer
  *    (rename-to-tombstone arbitration, then createExclusive);
  *  - a holder whose lease is stolen mid-commit ABORTS at its next
  *    swap point instead of interleaving renames with the thief, and
  *    its release never reaps the thief's lease;
  *  - a live holder HEARTBEATS, so a commit staging longer than the
  *    TTL is never judged dead;
  *  - [[AtomicPartitionWriter.withLeaseRetry]] retries ONLY commit
  *    contention, under the X1 backoff law.
  */
class LeaseSpec extends AnyFunSuite {
  lazy val spark = graft.GraftSession.local(4)
  def fsOps = LakeFs.local()
  def tmpDir(): String = Files.createTempDirectory("graft-lease").toString

  private def makeStale(fs: LakeFs, lease: String): Unit = {
    fs.createExclusive(lease, """{"app":"dead","ts":0}""")
    fs.fs.setTimes(new org.apache.hadoop.fs.Path(lease),
      System.currentTimeMillis() - AtomicPartitionWriter.LeaseTtlMs - 1000L, -1L)
  }

  test("N concurrent stealers of one stale lease: exactly one holds at a time") {
    val table = tmpDir()
    val fs = fsOps
    val w = new AtomicPartitionWriter(fs, spark)
    makeStale(fs, s"$table/_commit_lease")
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val losers = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        start.await()
        try {
          w.withCommitLease(table) {
            val now = inside.incrementAndGet()
            peak.getAndAccumulate(now, math.max)
            Thread.sleep(100)
            inside.decrementAndGet()
          }
          winners.incrementAndGet()
        } catch {
          case _: ConcurrentCommitException => losers.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(30000))
    assert(peak.get() === 1,
      s"two stealers held the lease concurrently (peak=${peak.get})")
    assert(winners.get() >= 1, "the stale lease must be stealable")
    assert(winners.get() + losers.get() === 8)
    // no tombstone litter from completed steals
    assert(!fs.lsRecursive(table).exists(_.contains("_commit_lease_tomb_")),
      "completed steals must reap their tombstones")
  }

  test("a holder whose lease was stolen aborts at the swap fence; release spares the thief") {
    val table = tmpDir()
    val fs = fsOps
    val w = new AtomicPartitionWriter(fs, spark)
    val lease = s"$table/_commit_lease"
    fs.mkdirs(s"$table/year=2023_tmp")
    w.withCommitLease(table) {
      // the thief: reaps the (supposedly stale) lease and takes its own
      fs.delete(lease)
      fs.createExclusive(lease, """{"app":"thief","ts":1}""")
      intercept[AtomicPartitionWriter.LeaseLostException] {
        w.swap(s"$table/year=2023_tmp", s"$table/year=2023",
          s"$table/year=2023_old")
      }
      // the fence fired BEFORE any rename: staged data untouched, no swap
      assert(fs.exists(s"$table/year=2023_tmp"))
      assert(!fs.exists(s"$table/year=2023"))
    }
    // ownership-checked release: the victim's exit must not delete the
    // thief's live lease
    assert(fs.exists(lease), "thief's lease must survive the victim's release")
    assert(fs.readString(lease).contains("thief"))
    fs.delete(lease)
  }

  test("swap under an intact lease proceeds (fence is ownership-keyed, not a veto)") {
    val table = tmpDir()
    val fs = fsOps
    val w = new AtomicPartitionWriter(fs, spark)
    fs.mkdirs(s"$table/year=2024_tmp")
    fs.touch(s"$table/year=2024_tmp/part-0")
    w.withCommitLease(table) {
      w.swap(s"$table/year=2024_tmp", s"$table/year=2024",
        s"$table/year=2024_old")
    }
    assert(fs.exists(s"$table/year=2024/part-0"))
    assert(!fs.exists(s"$table/_commit_lease"))
  }

  test("a live holder heartbeats: lease mtime advances, content stays its token") {
    val table = tmpDir()
    val fs = fsOps
    val w = new AtomicPartitionWriter(fs, spark) {
      override protected def leaseHeartbeatMs: Long = 50L
    }
    val lease = new org.apache.hadoop.fs.Path(s"$table/_commit_lease")
    w.withCommitLease(table) {
      val t0 = fs.fs.getFileStatus(lease).getModificationTime
      val c0 = fs.readString(s"$table/_commit_lease")
      // age the lease artificially, then wait for beats to re-freshen it
      fs.fs.setTimes(lease, t0 - 60000L, -1L)
      Thread.sleep(400)
      val t1 = fs.fs.getFileStatus(lease).getModificationTime
      assert(t1 > t0 - 60000L, "heartbeat must bump the lease mtime")
      assert(fs.readString(s"$table/_commit_lease") === c0,
        "heartbeat must never rewrite the token (ownership checks depend on it)")
    }
    assert(!fs.exists(s"$table/_commit_lease"))
  }

  test("withLeaseRetry: backs off on contention only, X1 law, exhaustion preserved") {
    val w = new AtomicPartitionWriter(fsOps, spark)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    var calls = 0
    val out = w.withLeaseRetry("t", maxRetries = 3, delaySeconds = 5.0,
      sleep = sleeps += _) {
      calls += 1
      if (calls < 3) throw new ConcurrentCommitException("/t", "other")
      "ok"
    }
    assert(out === "ok" && calls === 3)
    assert(sleeps.toSeq === Seq(5.0, 10.0))
    // a non-contention failure is NOT retried
    var dataCalls = 0
    intercept[IllegalArgumentException] {
      w.withLeaseRetry("t", maxRetries = 3, delaySeconds = 0.0, sleep = _ => ()) {
        dataCalls += 1
        throw new IllegalArgumentException("data error")
      }
    }
    assert(dataCalls === 1)
    // exhaustion surfaces as the X1 RetriesExhausted with the CCE cause
    val e = intercept[Retry.RetriesExhausted] {
      w.withLeaseRetry("t", maxRetries = 2, delaySeconds = 0.0, sleep = _ => ()) {
        throw new ConcurrentCommitException("/t", "other")
      }
    }
    assert(e.attempts === 2)
    assert(e.last.isInstanceOf[ConcurrentCommitException])
  }

  test("repair reaps TTL-expired steal tombstones, keeps fresh ones") {
    val table = tmpDir()
    val fs = fsOps
    val w = new AtomicPartitionWriter(fs, spark)
    fs.writeString(s"$table/_commit_lease_tomb_dead1234", "x")
    fs.fs.setTimes(new org.apache.hadoop.fs.Path(s"$table/_commit_lease_tomb_dead1234"),
      System.currentTimeMillis() - AtomicPartitionWriter.LeaseTtlMs - 1000L, -1L)
    fs.writeString(s"$table/_commit_lease_tomb_live5678", "x")
    val reaped = w.repair(table)
    assert(reaped.exists(_.endsWith("_commit_lease_tomb_dead1234")))
    assert(fs.exists(s"$table/_commit_lease_tomb_live5678"),
      "a fresh tombstone belongs to an in-flight steal — not litter yet")
  }
}
