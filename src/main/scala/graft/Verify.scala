package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  * `SPARK_GRAFT_QUERY_FILTER` (comma-separated name prefixes, same knob
  * as Bench) restricts the dump for fast iteration; the driver runs
  * unfiltered. */
object Verify {
  /** Dump one query's result parquet; on ANY failure return the error
    * AND still write a one-row `_graft_error` parquet in the query's
    * slot. The gate JSON is built from the dumped dirs, so a query whose
    * dump merely printed to stderr would VANISH from the round's
    * correctness record (round 8: q22's AnalysisException under-counted
    * the graded set by one). The sentinel row can never hash-match any
    * oracle — the breakage is counted as a red row, not hidden.
    */
  def dumpQuery(spark: SparkSession,
      name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      sfDir: String, outDir: String): Option[Throwable] =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      try {
        import spark.implicits._
        Seq(e.toString.take(1000)).toDF("_graft_error")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case _: Throwable => () } // never mask the original error
      Some(e)
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val filters = sys.env.get("SPARK_GRAFT_QUERY_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    // harness runs land in the JSON-lines ledger too (same channel the
    // pipeline binds — the driver gets a queryable record of the dump)
    val vlog = graft.util.StructuredLog.setup("verify").forModule("graft.Verify")
    val spark = GraftSession.local(cpus.toInt)
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter { case (name, _) =>
      filters.isEmpty || filters.exists(name.startsWith)
    }
    // a leaked filter env var must never be mistaken for a full dump
    if (filters.nonEmpty)
      System.err.println(s"[verify] WARNING: SPARK_GRAFT_QUERY_FILTER active — " +
        s"dumping ${selected.size} of ${SparkEntry.queries.size} queries (PARTIAL dump)")
    selected.foreach { case (name, fn) =>
      dumpQuery(spark, name, fn, sfDir, outDir).foreach { e =>
        System.err.println(s"[verify] $name failed: ${e.toString.take(500)}")
        Option(e.getCause).foreach(c =>
          System.err.println(s"[verify]   cause: ${c.toString.take(500)}"))
        vlog.error("query dump failed", "query" -> name,
          "error" -> e.toString.take(300))
      }
    }
    vlog.info("verify dump complete", "sf" -> sfDir, "out" -> outDir,
      "queries" -> selected.size)
    // JSON string escape (shared with Versioning's sidecar) — a tab or CR
    // in builder-authored SQL would otherwise make the driver's json.load
    // fail and silently zero the round's correctness.
    def q(s: String): String = graft.util.Json.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
