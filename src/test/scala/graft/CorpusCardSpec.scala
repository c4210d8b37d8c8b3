package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPrep, TextOps}

/** Hand fixtures for the q220 Zipf fit (integer log-log OLS replayed
  * by hand) and the q221 dataset card (dup/short/lang panel).
  */
class CorpusCardSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  import spark.implicits._

  test("q220 Zipf fit replays the floor-log2 normal equations") {
    // freqs a=4, b=2, c=1 → points (x=log2 rank, y=log2 freq):
    // (0,2), (1,1), (1,0) → slope -3/2, intercept 2, r² 3/4 (in ppm)
    val docs = Seq((1L, "s", "a a a a b b c"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.zipfFitFor(docs).collect().head
    assert(out.getLong(0) == 3L)
    assert(out.getLong(1) == -1500000L)
    assert(out.getLong(2) == 2000000L)
    assert(out.getLong(3) == 750000L)
  }

  test("q220 slope is negative and near -1e6 on a true Zipf corpus") {
    // f(r) = 2^(10 - log2 r): rank-2^k tokens with frequency 2^(10-k)
    val words = (0 to 9).flatMap { k =>
      val reps = 1 << (10 - k) // frequency per token at this octave
      (0 until (1 << k)).flatMap(i => Seq.fill(reps)(s"w${k}_$i"))
    }
    val docs = Seq((1L, "s", words.mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = TextOps.zipfFitFor(docs).collect().head
    val slope = out.getLong(1)
    assert(slope < -900000L && slope > -1100000L, s"slope $slope")
  }

  test("q222 B-cubed algebra on hand labels") {
    // truth {1,2} + {3}; clustering glues all three: per-doc precision
    // 2/3, 2/3, 1/3 → 555555 ppm; recall perfect; F1 by the quantized
    // harmonic mean
    val labeled = Seq(
      (1L, "fpA", 10L), (2L, "fpA", 10L), (3L, "fpB", 10L))
      .toDF("doc_id", "fp", "cluster")
    val m = invokeBcubed(labeled).collect().head
    assert((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) ==
      ((3L, 555555L, 1000000L, 714285L)))
  }

  test("q222 perfect clustering scores 1e6 on both axes") {
    val labeled = Seq(
      (1L, "fpA", 1L), (2L, "fpA", 1L), (3L, "fpB", 3L))
      .toDF("doc_id", "fp", "cluster")
    val m = invokeBcubed(labeled).collect().head
    assert((m.getLong(1), m.getLong(2), m.getLong(3)) ==
      ((1000000L, 1000000L, 1000000L)))
  }

  private def invokeBcubed(labeled: org.apache.spark.sql.DataFrame) =
    graft.operators.Dedup.bcubed(labeled)

  test("q221 dataset card: dup mass, short share, language spread") {
    val docs = Seq(
      (1L, "dup text", "en", "s1", 8L),
      (2L, "Dup  Text", "en", "s1", 9L), // normalizes to the same fp
      (3L, "unique", "de", "s1", 6L),
      (4L, "solo", "fr", "s2", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusPrep.datasetCardFor(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(out("s1") == ((3L, 2L, 23L, 7L, 1000000L, 2L, 666666L)))
    assert(out("s2") == ((1L, 1L, 200L, 200L, 0L, 0L, 0L)))
  }

  private def cm(rows: (String, String, Long)*) =
    rows.toDF("lang", "pred_lang", "n")

  test("q241 PRF: hand-computed marginals, zero-prediction class safe") {
    // en: tp 8 of 10 true, 13 predicted; es: tp 5 of 10 true, 7 predicted
    val out = TextOps.confusionPrfFor(cm(
      ("en", "en", 8L), ("en", "es", 2L), ("es", "es", 5L), ("es", "en", 5L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val pEn = 8L * 1000000 / 13; val rEn = 800000L
    assert(out("en") == ((10L, 13L, 8L, pEn, rEn,
      2 * pEn * rEn / (pEn + rEn))))
    val pEs = 5L * 1000000 / 7; val rEs = 500000L
    assert(out("es") == ((10L, 7L, 5L, pEs, rEs,
      2 * pEs * rEs / (pEs + rEs))))
    // a class the model never predicts gets precision 0, not a crash
    val und = TextOps.confusionPrfFor(cm(("de", "en", 4L), ("en", "en", 4L)))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(und("de") == 0L)
  }

  test("q242 kappa: chance-corrected, truncates like both engines") {
    // po = 13/20, pe = (10·13 + 10·7)/400 = 1/2 → kappa = 0.30
    val k1 = TextOps.confusionKappaFor(cm(
      ("en", "en", 8L), ("en", "es", 2L), ("es", "es", 5L), ("es", "en", 5L)))
      .collect().head
    assert((k1.getLong(2), k1.getLong(3), k1.getLong(4)) ==
      ((650000L, 500000L, 300000L)))
    // worse-than-chance: po = 1/3, pe = 5/9 → −222222000000/444445 =
    // −499998.12…, which must TRUNCATE to −499998 on BOTH engines
    // (DuckDB 1.0.0: -7 // 2 = -3, i.e. `//` truncates toward zero
    // exactly like Spark's DIV; the old floor "correction" here broke
    // the sf0.001 hash by 1 ppm on exactly this case)
    val k2 = TextOps.confusionKappaFor(cm(
      ("en", "en", 1L), ("en", "es", 1L), ("es", "en", 1L)))
      .collect().head
    assert((k2.getLong(2), k2.getLong(3), k2.getLong(4)) ==
      ((333333L, 555555L, -499998L)))
  }
}
