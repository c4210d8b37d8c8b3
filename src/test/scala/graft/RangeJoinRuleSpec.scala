package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** Contract tests for the [[RangeJoinRewrite]] optimizer rule: the
  * rewritten plan must be an equi-join (never nested-loop/cartesian)
  * and return EXACTLY the rows of the un-rewritten theta join, across
  * bound strictness, extra conjuncts, negative values, and either join
  * orientation; joins that already have an equi key, or outer joins,
  * must be left alone.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def points = (0L until 400L).map(i => (i, i * 7 % 1000)).toDF("pid", "ts")
  private def intervals = (0L until 60L).map { i =>
    (i, i * 17 % 900, i * 17 % 900 + (i % 4) * 23)
  }.toDF("iid", "s", "e")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def withBin[A](size: Long)(f: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinSizeKey, size.toString)
    try f finally spark.conf.unset(RangeJoinRewrite.BinSizeKey)
  }

  test("BETWEEN join rewrites to a binned equi-join with identical rows") {
    def q = points.join(intervals, $"ts" >= $"s" && $"ts" <= $"e")
    val baseline = rows(q)
    assert(plan(q).contains("BroadcastNestedLoopJoin"), "un-rewritten form is nested-loop")
    withBin(10) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule must produce an equi-join:\n${p.take(2000)}")
      assert(p.contains("Generate explode"), s"interval explode expected:\n${p.take(2000)}")
      assert(rows(q) == baseline)
    }
  }

  test("strict bounds and extra residual conjuncts stay exact") {
    def q = points.join(intervals,
      $"ts" > $"s" && $"ts" < $"e" && $"pid" % 3 =!= $"iid" % 3)
    val baseline = rows(q)
    withBin(7) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
      assert(rows(q) == baseline)
    }
  }

  test("negative domains bin correctly (truncating division both sides)") {
    val negPoints = (-200L until 200L).map(i => (i, i)).toDF("pid", "ts")
    val negIv = (-20L until 20L).map(i => (i, i * 13, i * 13 + 9)).toDF("iid", "s", "e")
    def q = negPoints.join(negIv, $"ts" >= $"s" && $"ts" <= $"e")
    val baseline = rows(q)
    withBin(10) {
      assert(!plan(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == baseline)
    }
  }

  test("reversed orientation (intervals on the left) also rewrites") {
    def q = intervals.join(points, $"ts" >= $"s" && $"ts" <= $"e")
    val baseline = rows(q)
    withBin(10) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
      assert(rows(q) == baseline)
    }
  }

  test("joins with an equi key are left alone; outer range joins too") {
    withBin(10) {
      val equi = points.join(intervals, $"pid" % 60 === $"iid" && $"ts" >= $"s" && $"ts" <= $"e")
      assert(!plan(equi).contains("Generate explode"),
        "equi-keyed join must not be rewritten (hash join already)")
      val outer = points.join(intervals, $"ts" >= $"s" && $"ts" <= $"e", "left")
      assert(!plan(outer).contains("Generate explode"),
        "outer joins are out of scope")
    }
  }

  test("interval-overlap theta join rewrites with the anchor-bin dedup") {
    val a = (0L until 80L).map(i => (i, i * 11 % 500, i * 11 % 500 + (i % 5) * 17))
      .toDF("aid", "sa", "ea")
    val b = (0L until 70L).map(i => (i, i * 13 % 480, i * 13 % 480 + (i % 4) * 21))
      .toDF("bid", "sb", "eb")
    def q = a.join(b, $"sa" <= $"eb" && $"sb" <= $"ea")
    val baseline = rows(q)
    withBin(16) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"overlap join must become an equi-join:\n${p.take(2000)}")
      assert(rows(q) == baseline, "same pairs, exactly once each")
    }
  }

  test("overlap rewrite stays exact with strict bounds and residual conjuncts") {
    val a = (0L until 60L).map(i => (i, i * 7 % 300, i * 7 % 300 + 25)).toDF("aid", "sa", "ea")
    val b = (0L until 50L).map(i => (i, i * 9 % 280, i * 9 % 280 + 15)).toDF("bid", "sb", "eb")
    def q = a.join(b, $"sa" < $"eb" && $"sb" < $"ea" && $"aid" % 2 === $"bid" % 2 - $"bid" % 2)
    // note: aid%2 === bid%2-bid%2 is aid%2===0, single-side — not an equi key across sides
    val baseline = rows(q)
    withBin(16) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
      assert(rows(q) == baseline)
    }
  }

  test("int-typed columns are cast and rewritten") {
    val ip = (0 until 300).map(i => (i, i)).toDF("pid", "ts") // IntegerType
    val iv = (0 until 30).map(i => (i, i * 9, i * 9 + 12)).toDF("iid", "s", "e")
    def q = ip.join(iv, $"ts" >= $"s" && $"ts" <= $"e")
    val baseline = rows(q)
    withBin(8) {
      assert(!plan(q).contains("BroadcastNestedLoopJoin"))
      assert(rows(q) == baseline)
    }
  }
}
