package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.SchemaEvolution

/** The q212 merged-read audit on the smallest SF: per-version
  * presence counts must mirror the add/drop pair exactly, and the
  * staging dir must follow the app-id isolation rule.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("merged read reconciles the add/drop column pair") {
    val out = SchemaEvolution.mergedReadAudit(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out.keySet == Set(1L, 2L))
    val (n1, p1, pr1, y1, ps1, ys1) = out(1L)
    val (n2, p2, pr2, y2, ps2, ys2) = out(2L)
    // v1 carries priority for every row, never year; v2 the reverse
    assert(n1 > 0 && p1 == n1 && pr1 == n1 && y1 == 0L && ys1 == 0L)
    assert(n2 > 0 && p2 == n2 && pr2 == 0L && y2 == n2)
    assert(ps1 > 0L && ps2 > 0L && ys2 >= n2 * 1992L)
    // even/odd split covers the whole table
    val total = graft.sources.Tables.orders(spark, sf).count()
    assert(n1 + n2 == total)
  }

  test("staging dir carries the application id (concurrent-run rule)") {
    val dir = SchemaEvolution.stagingDir(spark, sf)
    assert(dir.contains(spark.sparkContext.applicationId))
    SchemaEvolution.mergedReadAudit(spark, sf).collect()
    assert(new java.io.File(dir).isDirectory)
    assert(new java.io.File(dir, "v=1").isDirectory)
    assert(new java.io.File(dir, "v=2").isDirectory)
  }
}
