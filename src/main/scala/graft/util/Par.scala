package graft.util

/** Overlap INDEPENDENT Spark actions from driver threads (optimization
  * guide §2.6: the scheduler happily runs several jobs at once inside
  * one application; actions are only sequential because driver code
  * calls them sequentially). The lifecycle operators' members/codes/
  * model commits write DIFFERENT table directories under SEPARATE
  * leases from one shared cached relation — running them concurrently
  * lets the second job's tasks back-fill executors freed by the first
  * job's tail, and overlaps the two commits' driver-side FS work
  * (staging renames, listings) with the other side's compute.
  *
  * Safety preconditions (every call site in this repo satisfies them):
  *  - the thunks touch DISJOINT output directories (lease per dir);
  *  - any shared input is a persisted/checkpointed relation — Spark's
  *    BlockManager computes each cached partition once and blocks
  *    other readers, so a shared cache is not computed twice;
  *  - `SparkContext` local properties (job description/group) are an
  *    InheritableThreadLocal, so the fresh thread keeps the caller's
  *    labels.
  *
  * Threads are created per call (no shared pool): call sites overlap
  * 1-3 second write jobs, so thread creation cost is noise and a fixed
  * pool could deadlock under nesting.
  *
  * INVARIANT (r16 verdict hardening): nothing inside a Par region may
  * mutate SESSION-GLOBAL state that concurrently-running work reads —
  * in particular the streaming drains' `withStatePartitions` wrapper
  * rewrites `spark.sql.shuffle.partitions` for the whole session, so a
  * drain scheduled inside a Par region would re-plan the OTHER thread's
  * batch query at the drain's state-partition count. [[regionActive]]
  * lets such writers fail fast instead (the drain layer asserts it).
  */
object Par {
  private val activeRegions = new java.util.concurrent.atomic.AtomicInteger(0)

  /** True while ANY Par region is running in this JVM — coarse by
    * design: the hazard guarded against is a session-global conf write
    * racing any concurrently-scheduled sibling, not a per-thread
    * relationship.
    */
  def regionActive: Boolean = activeRegions.get() > 0
  /** Run `fa` on the calling thread and `fb` on a fresh thread,
    * concurrently. Waits for BOTH to finish before returning or
    * throwing (never leaves a commit running past the call), then
    * rethrows `fa`'s failure first, else `fb`'s.
    */
  def pair[A, B](fa: => A, fb: => B): (A, B) = {
    val (Seq(a, b), _) = runAll(Seq(() => fa, () => fb))
    (a.asInstanceOf[A], b.asInstanceOf[B])
  }

  /** Run three independent thunks concurrently (first on the calling
    * thread); same wait-for-all / first-failure contract as [[pair]].
    */
  def triple[A, B, C](fa: => A, fb: => B, fc: => C): (A, B, C) = {
    val (Seq(a, b, c), _) = runAll(Seq(() => fa, () => fb, () => fc))
    (a.asInstanceOf[A], b.asInstanceOf[B], c.asInstanceOf[C])
  }

  private def runAll(thunks: Seq[() => Any]): (Seq[Any], Unit) = {
    activeRegions.incrementAndGet()
    try runAllInRegion(thunks)
    finally activeRegions.decrementAndGet()
  }

  private def runAllInRegion(thunks: Seq[() => Any]): (Seq[Any], Unit) = {
    val results = new Array[Any](thunks.size)
    val errors = new Array[Throwable](thunks.size)
    val threads = thunks.zipWithIndex.drop(1).map { case (t, i) =>
      val th = new Thread(() => {
        try results(i) = t()
        catch { case e: Throwable => errors(i) = e }
      }, s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    try results(0) = thunks.head()
    catch { case e: Throwable => errors(0) = e }
    threads.foreach(_.join())
    errors.collectFirst { case e if e != null => throw e }
    (results.toSeq, ())
  }
}
