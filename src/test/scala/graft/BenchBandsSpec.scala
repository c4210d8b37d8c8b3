package graft

import org.scalatest.funsuite.AnyFunSuite

/** The family-band tripwire's law: inside-band silence, outside-band
  * flag (with the absolute slack absorbing sub-second jitter), unbanded
  * families always flagged, and the recorded band list covering exactly
  * the families the registry produces.
  */
class BenchBandsSpec extends AnyFunSuite {

  test("inside the band (incl. the documented ±40% host spread): silence") {
    assert(BenchBands.flags(Map("dedup" -> 50.2)).isEmpty)
    assert(BenchBands.flags(Map("dedup" -> 50.2 * 1.4)).isEmpty)
    assert(BenchBands.flags(Map("dedup" -> 50.2 * 0.6)).isEmpty)
  }

  test("a q167-style 3x excursion is flagged") {
    val f = BenchBands.flags(Map("streaming" -> 26.1 * 3.0))
    assert(f.size === 1 && f.head.contains("streaming") &&
      f.head.contains("above band"))
  }

  test("a structural collapse (family went no-op) is flagged low") {
    val f = BenchBands.flags(Map("dedup" -> 1.0))
    assert(f.size === 1 && f.head.contains("below band"))
  }

  test("sub-second families never flag on whole-multiple jitter") {
    // multimodal quiet 1.4 s: 3x = 4.2, excursion 1.4 < 2 s slack
    assert(BenchBands.flags(Map("multimodal" -> 4.2)).isEmpty)
  }

  test("an unbanded family is always flagged (stale recording guard)") {
    val f = BenchBands.flags(Map("brand_new" -> 0.5))
    assert(f.size === 1 && f.head.contains("no recorded quiet band"))
  }

  test("recorded bands cover exactly the registry's family set") {
    val registryFams = SparkEntry.queryFamilies.values.toSet
    assert(registryFams === BenchBands.QuietWarmSec.keySet,
      s"bands and registry families must stay in lockstep: " +
        s"only-in-registry=${registryFams -- BenchBands.QuietWarmSec.keySet} " +
        s"only-in-bands=${BenchBands.QuietWarmSec.keySet -- registryFams}")
  }
}
