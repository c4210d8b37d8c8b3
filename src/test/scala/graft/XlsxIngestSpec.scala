package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{HeaderFlatten, XlsxGrid}

/** End-to-end spreadsheet ingest: a reference-shaped .xlsx (merged 4-row
  * Thai header, shared + inline strings, numeric cells) built from raw
  * zip+XML in the test, parsed by XlsxGrid, normalized by HeaderFlatten —
  * the openpyxl path of `gpt_excel_fix_column.py` without the Python.
  */
class XlsxIngestSpec extends AnyFunSuite {

  private def entry(z: ZipOutputStream, name: String, body: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(body.getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
  }

  /** Columns: A ว/ด/ป (merged A1:A4), B รายละเอียด (merged B1:B4),
    * C จำนวนเงินรวม (merged C1:C4), D fund header split over rows 1-3.
    * Data rows 5-8: Thai months/types, one invalid-type row, one blank
    * month to exercise forward fill.
    */
  private def writeFixture(): String = {
    val path = Files.createTempFile("graft-fixture", ".xlsx").toString
    val z = new ZipOutputStream(new FileOutputStream(path))
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets><sheet name="สรุปรายเดือน 67" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Target="worksheets/sheet1.xml"
        |    Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"/>
        |</Relationships>""".stripMargin)
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="8" uniqueCount="8">
        |  <si><t>ว/ด/ป</t></si>
        |  <si><t>รายละเอียด</t></si>
        |  <si><t>จำนวนเงินรวม</t></si>
        |  <si><t>กองทุนทั่วไป งานบริหารทั่วไป</t></si>
        |  <si><r><t>เงินอุด</t></r><r><t>หนุน</t></r></si>
        |  <si><t>wifi</t></si>
        |  <si><t>ตค66</t></si>
        |  <si><t>ยอดงบประมาณ</t></si>
        |</sst>""".stripMargin)
    // rows 1-4 header (merges fill A/B/C down), rows 5-8 data
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
        |    </row>
        |    <row r="2"><c r="D2" t="s"><v>4</v></c></row>
        |    <row r="3"><c r="D3" t="s"><v>5</v></c></row>
        |    <row r="4"/>
        |    <row r="5">
        |      <c r="A5" t="s"><v>6</v></c><c r="B5" t="s"><v>7</v></c>
        |      <c r="C5"><v>100</v></c><c r="D5"><v>60</v></c>
        |    </row>
        |    <row r="6">
        |      <c r="B6" t="inlineStr"><is><t>ยอดใช้ไป</t></is></c>
        |      <c r="C6"><v>30</v></c><c r="D6"><v>20</v></c>
        |    </row>
        |    <row r="7">
        |      <c r="B7" t="inlineStr"><is><t>ยอดรวม</t></is></c>
        |      <c r="C7"><v>999</v></c><c r="D7"><v>999</v></c>
        |    </row>
        |    <row r="8">
        |      <c r="A8" t="inlineStr"><is><t>พย66</t></is></c>
        |      <c r="B8" t="inlineStr"><is><t>ยอดคงเหลือ</t></is></c>
        |      <c r="C8"><v>70</v></c><c r="D8"><v>40</v></c>
        |    </row>
        |  </sheetData>
        |  <mergeCells count="3">
        |    <mergeCell ref="A1:A4"/><mergeCell ref="B1:B4"/><mergeCell ref="C1:C4"/>
        |  </mergeCells>
        |</worksheet>""".stripMargin)
    z.close()
    path
  }

  test("xlsx → grid → normalized English wide rows, reference-shaped") {
    val sheet = XlsxGrid.read(writeFixture(), Some("สรุปรายเดือน 67"))
    assert(sheet.name == "สรุปรายเดือน 67")
    assert(sheet.merges.length == 3)
    // rich-text shared string concatenates its runs
    assert(sheet.grid(1)(3) == "เงินอุดหนุน")

    val n = HeaderFlatten.normalize(sheet)
    assert(n.header ==
      Vector("month", "type", "total_amount", "general_subsidy_wifi"))
    assert(n.unmappedColumns.isEmpty)
    // invalid type row dropped; blank month forward-filled from ตค66
    assert(n.rows == Vector(
      Vector("2023-10", "budget", "100", "60"),
      Vector("2023-10", "spent", "30", "20"),
      Vector("2023-11", "remaining", "70", "40")))
  }

  test("cell refs parse past column Z") {
    assert(XlsxGrid.ref("A1") == (0, 0))
    assert(XlsxGrid.ref("Z3") == (2, 25))
    assert(XlsxGrid.ref("AA10") == (9, 26))
    assert(XlsxGrid.ref("BC23") == (22, 54))
  }
}
