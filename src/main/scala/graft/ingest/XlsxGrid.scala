package graft.ingest

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.parsers.DocumentBuilderFactory

import org.w3c.dom.{Document, Element}

/** Minimal .xlsx → cell-grid reader (reference S4 —
  * `gpt_excel_fix_column.py:77-99` does this with openpyxl): an .xlsx
  * file is a zip of XML parts, so the JDK's ZipFile + DOM parser cover
  * the subset the finance workbooks use — shared strings, inline
  * strings, numbers, merged-cell ranges — without any spreadsheet
  * dependency. Values are returned as raw strings (`data_only` style:
  * cached formula results, never formula text); [[HeaderFlatten]]
  * supplies the downstream merged-fill / header-flatten / rename logic.
  */
object XlsxGrid {

  /** One worksheet as a dense grid (rows × cols, "" for blanks) plus its
    * merged regions in [[HeaderFlatten.Merge]] form.
    */
  final case class Sheet(
      name: String,
      grid: Vector[Vector[String]],
      merges: Seq[HeaderFlatten.Merge])

  /** Read one sheet (by name, or the workbook's first). */
  def read(path: String, sheetName: Option[String] = None): Sheet = {
    val zip = new ZipFile(path)
    try {
      val wb = parse(open(zip, "xl/workbook.xml"))
      val rels = parse(open(zip, "xl/_rels/workbook.xml.rels"))
      val shared = zip.getEntry("xl/sharedStrings.xml") match {
        case null => Vector.empty[String]
        case e => sharedStrings(parse(zip.getInputStream(e)))
      }
      val sheets = elems(wb, "sheet").map { s =>
        (s.getAttribute("name"), s.getAttribute("r:id"))
      }
      val (name, rid) = sheetName match {
        case Some(n) => sheets.find(_._1 == n)
          .getOrElse(sys.error(s"sheet '$n' not in ${sheets.map(_._1)}"))
        case None => sheets.headOption.getOrElse(sys.error("workbook has no sheets"))
      }
      val target = elems(rels, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target").stripPrefix("/xl/").stripPrefix("./"))
        .getOrElse(sys.error(s"no relationship for sheet id $rid"))
      val ws = parse(open(zip, s"xl/$target"))
      Sheet(name, grid(ws, shared), merges(ws))
    } finally zip.close()
  }

  private def open(zip: ZipFile, entry: String): InputStream = {
    val e = zip.getEntry(entry)
    if (e == null) sys.error(s"$entry missing — not an .xlsx?")
    zip.getInputStream(e)
  }

  /** Hardened DOM parse (no doctypes / external entities). */
  private def parse(in: InputStream): Document = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    try f.newDocumentBuilder().parse(in) finally in.close()
  }

  private def elems(doc: Document, tag: String): Vector[Element] = {
    val nl = doc.getElementsByTagName(tag)
    (0 until nl.getLength).toVector.map(nl.item(_).asInstanceOf[Element])
  }

  private def childElems(e: Element, tag: String): Vector[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).toVector.map(nl.item(_).asInstanceOf[Element])
  }

  /** `si` entries: concatenation of every `t` descendant (plain and
    * rich-text runs).
    */
  private def sharedStrings(doc: Document): Vector[String] =
    elems(doc, "si").map(si => childElems(si, "t").map(_.getTextContent).mkString)

  /** "BC23" → (row 22, col 54), 0-based. */
  private[graft] def ref(r: String): (Int, Int) = {
    val (letters, digits) = r.span(_.isLetter)
    val col = letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
    (digits.toInt - 1, col)
  }

  private def cellValue(c: Element, shared: Vector[String]): String =
    c.getAttribute("t") match {
      case "s" => // shared-string index
        childElems(c, "v").headOption
          .map(v => shared(v.getTextContent.trim.toInt)).getOrElse("")
      case "inlineStr" =>
        childElems(c, "is").headOption
          .map(is => childElems(is, "t").map(_.getTextContent).mkString).getOrElse("")
      case _ => // n / str / b: the cached <v> text as-is
        childElems(c, "v").headOption.map(_.getTextContent).getOrElse("")
    }

  private def grid(ws: Document, shared: Vector[String]): Vector[Vector[String]] = {
    val cells = for {
      row <- elems(ws, "row")
      c <- childElems(row, "c")
      r = c.getAttribute("r") if r.nonEmpty
    } yield (ref(r), cellValue(c, shared))
    if (cells.isEmpty) return Vector.empty
    val nRows = cells.map(_._1._1).max + 1
    val nCols = cells.map(_._1._2).max + 1
    val out = Array.fill(nRows, nCols)("")
    cells.foreach { case ((r, cIdx), v) => out(r)(cIdx) = v }
    out.map(_.toVector).toVector
  }

  private def merges(ws: Document): Seq[HeaderFlatten.Merge] =
    elems(ws, "mergeCell").map { m =>
      val Array(a, b) = m.getAttribute("ref").split(":", 2)
      val ((r1, c1), (r2, c2)) = (ref(a), ref(b))
      HeaderFlatten.Merge(r1, c1, r2, c2)
    }
}
