package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.TableDiff

class TableDiffSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged exactly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val neu = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d"), (9L, "new"))
      .toDF("k", "v")
    val got = TableDiff.diff(old, neu, "k", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("removed") === ((1L, 1L)))
    assert(got("added") === ((1L, 9L)))
    assert(got("changed") === ((1L, 3L)))
    assert(got("unchanged") === ((2L, 6L)))
  }

  test("q161 audit populates every class with the predicted counts") {
    val sf = "/root/testdata/sf0.001"
    val got = TableDiff.diffAudit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set("added", "removed", "changed", "unchanged"))
    // replay the version rules from the raw keys
    val keys = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey").as[Long].collect()
    val v1 = keys.filterNot(_ % TableDiff.AddMod == 1L).toSet
    val v2 = keys.filterNot(_ % TableDiff.DeleteMod == 0L).toSet
    val both = v1 & v2
    assert(got("added") === (v2 -- v1).size.toLong)
    assert(got("removed") === (v1 -- v2).size.toLong)
    // price bump of 10% changes the fingerprint unless the bump floors
    // to zero cents, which cannot happen for these order totals
    assert(got("changed") === both.count(_ % TableDiff.ChangeMod == 0L).toLong)
    assert(got("unchanged") === both.count(_ % TableDiff.ChangeMod != 0L).toLong)
  }
}
