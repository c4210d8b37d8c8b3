package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val o = graft.sources.Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val t1 = s"b_lineitem_${System.nanoTime()}"
    val t2 = s"b_orders_${System.nanoTime()}"
    Bucketing.writeBucketed(li, t1, "l_orderkey", 8)
    Bucketing.writeBucketed(o, t2, "l_orderkey", 8)
    // force sort-merge on both joins so the exchange comparison isolates
    // bucketing (not the small-table broadcast path)
    val joined = spark.table(t1).hint("merge").join(spark.table(t2), "l_orderkey")
    // correctness: same rows as the plain join
    val plain = li.hint("merge").join(o, "l_orderkey")
    assert(joined.count() == plain.count())
    // the point of bucketing: no shuffle on either side
    assert(Bucketing.isExchangeFree(joined),
      joined.queryExecution.executedPlan.toString.take(2000))
    // sanity: the unbucketed join DOES shuffle
    assert(!Bucketing.isExchangeFree(plain))
  }
}
