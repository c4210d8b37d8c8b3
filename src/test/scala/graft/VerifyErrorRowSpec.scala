package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The correctness gate is built from the dumped parquet dirs — so a
  * query whose dump THROWS must still occupy its slot (round 8: q22's
  * AnalysisException made it vanish from CORRECTNESS_r08 entirely,
  * under-counting the graded set). [[Verify.dumpQuery]] writes a one-row
  * `_graft_error` sentinel that can never match any oracle: breakage is
  * counted as a red row, not hidden.
  */
class VerifyErrorRowSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(2)

  test("a throwing query still dumps an error-row parquet in its slot") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    val boom = new RuntimeException("synthetic failure for the gate test")
    val err = Verify.dumpQuery(spark, "q_fail",
      (_, _) => throw boom, "/nonexistent", out)
    assert(err.contains(boom), "the original error must be surfaced")
    val dumped = spark.read.parquet(s"$out/q_fail")
    assert(dumped.columns.toSeq == Seq("_graft_error"))
    val msgs = dumped.collect().map(_.getString(0))
    assert(msgs.length == 1 && msgs(0).contains("synthetic failure"))
  }

  test("a succeeding query dumps its result and returns no error") {
    val out = Files.createTempDirectory("graft-verify-ok").toString
    val err = Verify.dumpQuery(spark, "q_ok",
      (s, _) => s.range(3).toDF("n"), "/unused", out)
    assert(err.isEmpty)
    assert(spark.read.parquet(s"$out/q_ok").count() == 3)
  }
}
