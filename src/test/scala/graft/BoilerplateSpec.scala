package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Hand fixtures for the cross-document boilerplate screen (q208):
  * document frequency is DISTINCT-document frequency, density is exact
  * ppm over the doc's distinct shingles.
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, "s", t) }.toDF("doc_id", "source", "text")

  test("shingles shared by >= MinDf docs mark boilerplate, ppm exact") {
    // "x y z" lives in three docs → boilerplate; all other shingles
    // are unique; d4 is too short to host it
    val out = TextOps.boilerplateDensityFor(docs(
        (1L, "x y z p q"), (2L, "x y z r s"), (3L, "x y z t u"),
        (4L, "m n o")))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, 333333L)))
    assert(out(2L) == ((3L, 1L, 333333L)))
    assert(out(3L) == ((3L, 1L, 333333L)))
    assert(out(4L) == ((1L, 0L, 0L)))
  }

  test("within-document repetition counts once toward df") {
    // "x y z" occurs twice in d1 and once in d2 → df = 2 < MinDf, so
    // occurrence-counting (3 >= MinDf) would wrongly flag it
    val out = TextOps.boilerplateDensityFor(docs(
        (1L, "x y z x y z"), (2L, "x y z a b"), (3L, "p q r")))
      .collect()
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("density is invariant to input partitioning") {
    val d = docs((1L, "x y z p q"), (2L, "x y z r s"), (3L, "c x y z d"))
    val a = TextOps.boilerplateDensityFor(d).collect().toSet
    val b = TextOps.boilerplateDensityFor(d.repartition(5)).collect().toSet
    assert(a == b)
  }
}
