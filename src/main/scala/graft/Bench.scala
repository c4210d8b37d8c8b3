package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Runs the full query surface twice and reports both passes in one
    * JSON line. `value`/`queries` is the COLD pass (first execution:
    * Catalyst planning + whole-stage-codegen compilation + execution) —
    * directly comparable to earlier rounds' numbers. `warm_value`/
    * `warm_queries` is the immediate second execution, which isolates
    * data-path throughput from the ~2-4 s/query one-time plan+JIT cost
    * measured on this host (tools/TimeLab `relational` mode) — the number
    * that scales with data volume on a real cluster, where compilation is
    * amortized over 1000 executors × TBs, not 60 sub-second queries.
    *
    * The measured action is a `noop`-format write, not `count()`: a
    * count lets Catalyst prune every unreferenced column, so projection-
    * terminal queries (q02, q29, q31, q44, q50) would measure a pruned
    * scan instead of the declared work. The noop sink evaluates every
    * output column and discards rows at the sink — the same work a real
    * write performs, minus the IO.
    *
    * Env knobs: `SPARK_GRAFT_SF_DIR` (data dir), `SPARK_GRAFT_CPUS`,
    * `SPARK_GRAFT_QUERY_FILTER` (comma-separated name prefixes — run a
    * subset, e.g. the dedup family for scale rehearsals), and
    * `SPARK_GRAFT_BENCH_OUT` (also write the JSON line to this file so a
    * truncated stdout capture can't lose it; default `bench_out.json`).
    */
  // locale-independent fixed-point rendering for the JSON contract
  // line (the f-interpolator uses the default locale — a comma decimal
  // separator would emit malformed JSON)
  // non-finite guard: BigDecimal.valueOf throws on NaN/Infinity (a
  // degenerate upstream timing would crash the whole contract line) —
  // emit JSON null instead and keep the line parseable
  private def jnum(v: Double, scale: Int): String =
    if (!java.lang.Double.isFinite(v)) "null"
    else java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP).toPlainString

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val filters = sys.env.get("SPARK_GRAFT_QUERY_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // harness runs land in the JSON-lines ledger too (second
    // machine-readable channel next to the stdout contract line)
    val blog = graft.util.StructuredLog.setup("bench").forModule("graft.Bench")
    val spark = GraftSession.local(cpus.toInt)
    // ERROR-only logging for the bench run: the driver keeps only a
    // bounded tail of the combined output, and a single WARN with an
    // attached physical plan (e.g. a codegen fallback) is multi-KB —
    // enough to flood the capture and lose the contract line (the
    // BENCH_r06 failure mode, 4th round of `parsed: null`)
    spark.sparkContext.setLogLevel("ERROR")
    // absorb session/codegen warmup outside the measured window
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      filters.isEmpty || filters.exists(name.startsWith)
    }
    def runPass(): (Seq[(String, Double)], Int) = {
      var failures = 0
      val timings = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } catch {
          case e: Throwable =>
            failures += 1
            System.err.println(s"[bench] $name FAILED: ${e.toString.take(300)}")
            blog.error("query failed", "query" -> name, "error" -> e.toString.take(300))
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      (timings, failures)
    }
    val (cold, coldFailures) = runPass()
    val (warm0, warmFailures) = runPass()
    // Contention guard: a warm run should never cost 3× its cold run —
    // when it does (host contention from a co-tenant process, the
    // BENCH_r07 failure mode: q64 17.0 s vs a thrice-measured 2.3-3.4 s
    // band), the sample is measuring the host, not the plan. Re-run
    // once and keep the minimum; the floor skips sub-second noise.
    val coldByName = cold.toMap
    var reruns = 0
    val warm = warm0.map { case (name, t) =>
      val c = coldByName.getOrElse(name, Double.MaxValue)
      if (t > 1.0 && t > 3.0 * c) {
        reruns += 1
        val t0 = System.nanoTime()
        val t2 = try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => Double.MaxValue }
        val best = math.min(t, t2)
        System.err.println(f"[bench] $name warm $t%.2fs > 3x cold $c%.2fs — rerun $t2%.2fs, keeping $best%.2fs")
        blog.warn("contended warm sample rerun", "query" -> name,
          "warm_sec" -> t, "cold_sec" -> c, "rerun_sec" -> t2)
        name -> best
      } else name -> t
    }
    if (coldFailures + warmFailures > 0)
      System.err.println(
        s"[bench] $coldFailures cold / $warmFailures warm query runs failed — totals are partial")
    // ANN serving budget (round-9 verdict item 4): the √N production
    // claim is carried by the FIXED-budget measurement (1000 queries
    // through the derived-knob searches, whatever the corpus size) —
    // the graded q106/q108 can't make it because their query set grows
    // with the corpus. Re-measured every bench run as a contract field
    // instead of an ad-hoc TimeLab invocation. Two samples, warm kept
    // (serving cost is steady-state); skipped under a query filter
    // (scale-rehearsal runs measure their own subset).
    case class AnnBudget(n: Long, nlist: Int, nprobe: Int, k: Int,
      ivfColdSec: Double, ivfWarmSec: Double,
      ivfpqColdSec: Double, ivfpqWarmSec: Double)
    val annBudget: Option[AnnBudget] = if (filters.nonEmpty) None else try {
      import graft.operators.Similarity
      val n = graft.sources.Tables.embeddings(spark, sfDir).count()
      val nlist = Similarity.nlistFor(n)
      val nprobe = Similarity.nprobeFor(nlist)
      val k = Similarity.pqKFor(n)
      def sample(df: => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      def ivf() = sample(Similarity.ivfKnnFor(spark, sfDir, nlist, nprobe,
        queryBudget = Some(1000L)))
      def ivfpq() = sample(Similarity.ivfPqSearchFor(spark, sfDir, nlist, nprobe, k,
        queryBudget = Some(1000L)))
      val (ic, pc) = (ivf(), ivfpq())
      val (iw, pw) = (ivf(), ivfpq())
      Some(AnnBudget(n, nlist, nprobe, k, ic, iw, pc, pw))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] ann budget measurement failed: ${e.toString.take(300)}")
        blog.error("ann budget failed", "error" -> e.toString.take(300))
        None
    }
    // headline per-query serving cost: the warm full IVF-PQ search over
    // the 1000-query budget, in ms/query
    val annMsPerQ = annBudget.map(b => b.ivfpqWarmSec * 1000.0 / 1000.0)
    def fmt(rs: Seq[(String, Double)], scale: Int = 9): String =
      rs.map { case (k, v) =>
        "\"" + k + "\":" + BigDecimal(v)
          .setScale(scale, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
      }.mkString("{", ",", "}")
    val coldTotal = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    // per-family subtotals (sidecar only): at 247 queries one total
    // hides where time goes — family rows make a round-over-round
    // regression attributable without per-query archaeology
    def famTotals(rs: Seq[(String, Double)]): Seq[(String, Double)] =
      rs.groupBy { case (n, _) =>
        SparkEntry.queryFamilies.getOrElse(n, "unclassified")
      }.map { case (f, xs) => f -> xs.map(_._2).sum }.toSeq.sortBy(_._1)
    // family regression tripwire (full surface only: a filtered run's
    // subtotals are partial by construction) — flags are reported,
    // never fatal; the band law lives in BenchBands, spec-pinned
    val familyFlags: Seq[String] =
      if (filters.nonEmpty) Seq.empty
      else BenchBands.flags(famTotals(warm).toMap)
    familyFlags.foreach { f =>
      System.err.println(s"[bench] FAMILY BAND: $f")
      blog.warn("family outside quiet band", "flag" -> f)
    }
    // Per-query timings for the driver's per_query/scaling tables,
    // fitted to the stdout budget: the driver parses a 2000-byte TAIL
    // of the combined output (measured: every BENCH_r*.json tail is
    // exactly 2000 bytes, the first line cut mid-character), so a full
    // 278-query map can NEVER fit — 278 names alone are ~5.6 KB, and
    // the full map (~2.6 KB at 79 queries) is exactly what produced
    // `parsed: null` in BENCH_r03/r04/r05. Instead the line carries the
    // TOP queries by cold cost (the only ones whose regressions are
    // distinguishable from host noise) greedily packed into a fixed
    // byte budget that keeps the whole line + sbt's trailing
    // "[success]" line inside the 2000-byte tail. Values are COLD
    // seconds per the original contract shape ({"name": sec}); both
    // full-precision per-query maps (cold AND warm, all queries) stay
    // in the sidecar.
    val stdoutQueries: String = {
      val budget = 1300 // bytes for the map's entries
      val entries = cold.sortBy(-_._2).iterator
        .map { case (n, v) => "\"" + n + "\":" + jnum(v, 2) }
      val sb = new StringBuilder
      var used = 0
      entries.takeWhile { e =>
        val cost = e.length + 1
        if (used + cost <= budget) { used += cost; true } else false
      }.foreach { e =>
        if (sb.nonEmpty) sb.append(',')
        sb.append(e)
      }
      "{" + sb.result() + "}"
    }
    def line(detail: Boolean): String = {
      // The driver stores only a bounded TAIL of stdout; even a
      // millisecond-precision per-query map (~2.6 KB at 79 queries)
      // overflowed it three rounds running (BENCH_r03/r04/r05
      // `parsed: null`). stdout therefore carries totals plus the
      // byte-budgeted top-query map above; both full-precision
      // per-query maps live in the sidecar file.
      s"""{"metric":"total","value":$coldTotal,"unit":"sec",""" +
        (if (detail) s""""queries":${fmt(cold)},"""
         else s""""queries":$stdoutQueries,""") +
        s""""warm_value":$warmTotal,""" +
        (if (detail) s""""warm_queries":${fmt(warm)},""" else "") +
        (if (detail)
          s""""families":${fmt(famTotals(cold), 3)},""" +
            s""""warm_families":${fmt(famTotals(warm), 3)},"""
         else "") +
        s""""failures":$coldFailures,"warm_failures":$warmFailures,""" +
        s""""warm_reruns":$reruns,""" +
        s""""family_flags":${familyFlags.size},""" +
        (if (detail && familyFlags.nonEmpty)
          familyFlags.map("\"" + _.replace("\"", "'") + "\"")
            .mkString("\"family_flag_detail\":[", ",", "],")
         else "") +
        // per-query ANN serving cost at the fixed 1000-query budget —
        // one compact number on stdout (the bounded-tail constraint);
        // the sidecar carries the full breakdown
        annMsPerQ.map(v => s""""ann_ms_per_q":${jnum(v, 2)},""").getOrElse("") +
        (if (detail) annBudget.map(b =>
          s""""ann_budget":{"n":${b.n},"nlist":${b.nlist},"nprobe":${b.nprobe},""" +
            s""""k":${b.k},"ivf_cold_sec":${jnum(b.ivfColdSec, 3)},""" +
            s""""ivf_warm_sec":${jnum(b.ivfWarmSec, 3)},""" +
            s""""ivfpq_cold_sec":${jnum(b.ivfpqColdSec, 3)},""" +
            s""""ivfpq_warm_sec":${jnum(b.ivfpqWarmSec, 3)}},""").getOrElse("")
         else "") +
        s""""sf":"$sfDir"}"""
    }
    blog.info("bench complete", "sf" -> sfDir, "queries" -> selected.size,
      "cold_sec" -> coldTotal, "warm_sec" -> warmTotal,
      "failures" -> (coldFailures + warmFailures), "warm_reruns" -> reruns)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line(detail = true) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // stop BEFORE printing so no executor/session shutdown chatter can
    // land after it: the contract line is the absolute last stdout act
    try spark.stop() catch { case _: Throwable => () }
    // Write the contract line STRAIGHT to fd 1, bypassing sbt's logger:
    // a non-forked `runMain` routes System.out through sbt, which
    // prefixes every line with "[info] " — exactly what made the driver's
    // json.loads fail on BENCH_r07 (`parsed: null` on an otherwise clean
    // run). A FileDescriptor.out stream reaches the same capture pipe
    // with no prefix, so the line is bare, parseable JSON.
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true,
      java.nio.charset.StandardCharsets.UTF_8)
    raw.println(line(detail = false))
    raw.flush()
  }
}
