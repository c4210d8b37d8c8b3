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
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    // absorb session/codegen warmup outside the measured window
    spark.range(1000000L).selectExpr("sum(id)").collect()
    var failures = 0
    def runPass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failures += 1
            System.err.println(s"[bench] $name FAILED: ${e.toString.take(300)}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val cold = runPass()
    val warm = runPass()
    if (failures > 0)
      System.err.println(s"[bench] $failures query runs failed — totals are partial")
    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val coldTotal = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    println(s"""{"metric":"total","value":$coldTotal,"unit":"sec","queries":${fmt(cold)},"warm_value":$warmTotal,"warm_queries":${fmt(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
