package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Association

class AssociationSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  // baskets: {1,2,3}, {1,2}, {1,2,4}, {3,4} as (orderkey, partkey) rows
  private def li = Seq(
    (10L, 1L), (10L, 2L), (10L, 3L),
    (20L, 1L), (20L, 2L),
    (30L, 1L), (30L, 2L), (30L, 4L),
    (40L, 3L), (40L, 4L),
    (40L, 4L) // duplicate lineitem for the same part: collect_set dedupes
  ).toDF("l_orderkey", "l_partkey")

  test("frequent pairs count basket support with a<b orientation") {
    val got = Association.frequentPairsFor(Association.baskets(li))
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) in 3 baskets; every other pair appears once and is cut by
    // MinSupport=2
    assert(got === Set((1L, 2L, 3L)))
  }

  test("rules emit both directions with exact ppm confidence and lift") {
    val got = Association.associationRulesFor(Association.baskets(li))
      .select("antecedent", "consequent", "support", "s_ant", "s_cons",
        "conf_ppm", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    // s(1)=3, s(2)=3, n=4; conf(1→2)=3/3; lift=3*4e6/9=1333333
    assert(got === Set(
      (1L, 2L, 3L, 3L, 3L, 1000000L, 1333333L),
      (2L, 1L, 3L, 3L, 3L, 1000000L, 1333333L)))
  }

  test("pair generation is per-basket bounded by the item cap") {
    val wide = Seq.tabulate(Association.BasketItemCap + 5)(i =>
      (99L, i.toLong)).toDF("l_orderkey", "l_partkey")
    val bk = Association.baskets(wide)
    assert(bk.select(size(col("ps"))).as[Int].head() ===
      Association.BasketItemCap)
  }

  test("result is invariant to input partitioning") {
    val a = Association.associationRulesFor(Association.baskets(li))
      .collect().toSet
    val b = Association.associationRulesFor(
      Association.baskets(li.repartition(7))).collect().toSet
    assert(a === b)
  }
}
