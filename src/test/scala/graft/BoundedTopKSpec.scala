package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract for the `graft_topk` bounded aggregate: k-bound,
  * (score desc, id asc) order with low-id tie wins, null-skip, and
  * partitioning/merge-order invariance (the property the partial-phase
  * pruning rests on).
  */
class BoundedTopKSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def topk(rows: Seq[(Long, Long, Long)], k: Int, parts: Int): Map[Long, Seq[(Long, Long)]] = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    rows.toDF("key", "score", "id")
      .repartition(parts)
      .groupBy($"key")
      .agg(expr(s"graft_topk(score, id, $k)").as("top"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getLong(0), e.getLong(1))).toSeq)
      .toMap
  }

  test("k-bound, score-desc order, lowest id wins ties") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 10L, 100L), (1L, 30L, 7L), (1L, 30L, 3L), (1L, 20L, 9L), (1L, 5L, 1L))
    val out = topk(rows, 3, 2)(1L)
    // ties at 30: id 3 before id 7; k=3 drops 10 and 5
    assert(out == Seq((30L, 3L), (30L, 7L), (20L, 9L)))
  }

  test("result is invariant to partitioning (merge-order independence)") {
    val rows = (0L until 500L).map(i => (i % 7, (i * 37) % 101, i))
    val p1 = topk(rows, 5, 1)
    val p8 = topk(rows, 5, 8)
    val p32 = topk(rows, 5, 32)
    assert(p1 == p8 && p8 == p32)
    assert(p1.values.forall(_.size == 5))
  }

  test("nulls are skipped; under-full groups return what exists") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val out = Seq((1L, Some(5L), Some(2L)), (1L, None, Some(3L)), (2L, Some(1L), Some(4L)))
      .toDF("key", "score", "id")
      .groupBy($"key")
      .agg(expr("graft_topk(score, id, 3)").as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).size).toMap
    assert(out == Map(1L -> 1, 2L -> 1))
  }
}
