package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.FlexibleMapping
import graft.ingest.FlexibleMapping.Hooks

/** The flexible-mapping seam driven end-to-end behind deterministic
  * stub models (reference `gpt_excel_flexible_column.py`): fenced JSON
  * answers, dictionary-first precedence, snake_case sanitation,
  * collision dedupe, passthrough on omission, and the null-tolerant
  * structure decode.
  */
class FlexibleMappingSpec extends AnyFunSuite {

  private def noHooks = Hooks(
    _ => fail("column hook must not be called"),
    _ => fail("value hook must not be called"),
    (_, _) => fail("structure hook must not be called"))

  test("flat JSON parser: escapes, nulls, fences; loud on malformed") {
    assert(FlexibleMapping.parseFlatObject("""{"a": "b", "c": null}""") ==
      Map("a" -> Some("b"), "c" -> None))
    assert(FlexibleMapping.parseFlatObject(
      "```json\n{\"q\\\"x\": \"line\\nbreak \\u0041\"}\n```") ==
      Map("q\"x" -> Some("line\nbreak A")))
    assert(FlexibleMapping.parseFlatObject("{}") == Map.empty)
    intercept[IllegalArgumentException] {
      FlexibleMapping.parseFlatObject("""{"a": "b" trailing}""")
    }
    intercept[IllegalArgumentException] {
      FlexibleMapping.parseFlatObject("not json at all")
    }
  }

  test("column mapping: dictionary first, model only sees the unknown remainder") {
    val known = Map("ค่าใช้จ่ายทั่วไป" -> "general_expense")
    var asked: Seq[String] = null
    val hooks = noHooks.copy(columnMapping = cols => {
      asked = cols
      // fenced, with a casing/punctuation mess the sanitizer must fix,
      // a null the passthrough must absorb, and a curated name the
      // model must NOT be able to override (it is never asked)
      """```json
        |{"อุปกรณ์ Firewall": "Asset Firewall!", "mystery": null}
        |```""".stripMargin
    })
    val out = FlexibleMapping.mapColumns(
      Seq("ค่าใช้จ่ายทั่วไป", "อุปกรณ์ Firewall", "mystery"), known, hooks)
    assert(asked == Seq("อุปกรณ์ Firewall", "mystery"))
    assert(out("ค่าใช้จ่ายทั่วไป") == "general_expense")
    assert(out("อุปกรณ์ Firewall") == "asset_firewall")
    assert(out("mystery") == "mystery")
  }

  test("column mapping: collisions dedupe in input order; no unknowns → no model call") {
    val hooks = noHooks.copy(columnMapping = _ =>
      """{"A b": "total", "a-B": "total", "Total": "total"}""")
    val out = FlexibleMapping.mapColumns(Seq("A b", "a-B", "Total"), Map.empty, hooks)
    assert(out.values.toSet == Set("total", "total_2", "total_3"))
    assert(out("A b") == "total")
    // all covered by the dictionary → the fail-hook is never invoked
    val dictOnly = FlexibleMapping.mapColumns(Seq("x"), Map("x" -> "x_en"), noHooks)
    assert(dictOnly == Map("x" -> "x_en"))
  }

  test("value mapping: Thai months and types resolve deterministically, rest via model") {
    var asked: Seq[String] = null
    val hooks = noHooks.copy(valueMapping = vs => {
      asked = vs
      """{"รวมทั้งปี": "all-year-budget"}"""
    })
    val out = FlexibleMapping.mapValues(
      Seq("ตค66", "ยอดคงเหลือ", "รวมทั้งปี", "2024-01"), hooks)
    assert(asked == Seq("รวมทั้งปี", "2024-01"))
    assert(out("ตค66") == "2023-10")       // deterministic month map
    assert(out("ยอดคงเหลือ") == "remaining") // deterministic type map
    assert(out("รวมทั้งปี") == "all-year-budget") // model
    assert(out("2024-01") == "2024-01")     // clean value passes through
  }

  test("structure analysis: nested type_values, nulls decode to None/empty") {
    val hooks = noHooks.copy(analyzeStructure = (cols, sample) => {
      assert(cols.contains("เดือน") && sample.contains("เดือน"))
      """```json
        |{"month_column": "เดือน", "type_column": null,
        | "type_values": {"budget": "ยอดงบประมาณ", "spent": null}}
        |```""".stripMargin
    })
    val s = FlexibleMapping.analyzeStructure(
      Seq("เดือน", "ยอด"), Map("เดือน" -> Seq("ตค66", "พย66")), hooks)
    assert(s.monthColumn.contains("เดือน"))
    assert(s.typeColumn.isEmpty)
    assert(s.typeValues == Map("budget" -> "ยอดงบประมาณ"))

    val none = FlexibleMapping.analyzeStructure(Seq("a"), Map.empty,
      noHooks.copy(analyzeStructure = (_, _) =>
        """{"month_column": null, "type_column": null, "type_values": null}"""))
    assert(none == FlexibleMapping.Structure(None, None, Map.empty))
  }
}
