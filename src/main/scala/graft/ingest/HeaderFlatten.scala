package graft.ingest

/** Pre-ingest spreadsheet normalization (reference S4/P9/P10 —
  * `gpt_excel_fix_column.py:79-204`): the pure transformations that turn
  * a merged-cell, multi-row-header spreadsheet grid into a flat CSV-ready
  * header + rows. The spreadsheet *parsing* (openpyxl in the reference)
  * stays outside the engine boundary; these functions operate on the
  * already-extracted cell grid, so they are engine-pure and fully
  * unit-testable.
  */
object HeaderFlatten {

  /** A merged region: rows r1..r2, cols c1..c2 (inclusive, 0-based). */
  final case class Merge(r1: Int, c1: Int, r2: Int, c2: Int)

  /** Propagate each merged region's top-left value to every covered cell
    * (reference `gpt_excel_fix_column.py:79-99`).
    */
  def fillMerged(grid: Vector[Vector[String]], merges: Seq[Merge]): Vector[Vector[String]] = {
    val out = grid.map(_.toArray).toArray
    for (m <- merges; v = grid(m.r1)(m.c1); r <- m.r1 to m.r2; c <- m.c1 to m.c2)
      out(r)(c) = v
    out.map(_.toVector).toVector
  }

  /** Flatten the first `headerRows` rows into one header: per column,
    * join non-empty, de-duplicated-in-sequence fragments with `_`
    * (reference `gpt_excel_fix_column.py:101-118`).
    */
  def flattenHeader(grid: Vector[Vector[String]], headerRows: Int = 4): Vector[String] = {
    if (grid.isEmpty) return Vector.empty
    val width = grid.map(_.length).max
    val rows = math.min(headerRows, grid.length)
    (0 until width).toVector.map { c =>
      val parts = (0 until rows)
        .map(r => if (c < grid(r).length) grid(r)(c).trim else "")
        .filter(_.nonEmpty)
      // collapse consecutive repeats produced by merged-cell fill
      val dedup = parts.foldLeft(Vector.empty[String]) {
        (acc, p) => if (acc.lastOption.contains(p)) acc else acc :+ p
      }
      dedup.mkString("_")
    }
  }

  /** Disambiguate duplicate column names with `_N` suffixes (reference
    * `gpt_excel_fix_column.py:119-126`): first occurrence keeps the name,
    * later ones get `_2`, `_3`, …
    */
  def dedupeNames(names: Vector[String]): Vector[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val k = seen.getOrElse(n, 0) + 1
      seen(n) = k
      if (k == 1) n else s"${n}_$k"
    }
  }

  /** Thai fiscal-month token → ISO month (reference P9 —
    * `gpt_excel_fix_column.py:190-198`): Thai month abbreviation + 2-digit
    * Buddhist-era year (ตค66 = Oct 2023). Passthrough on no match.
    */
  private val thaiMonths = Vector(
    "มค" -> 1, "กพ" -> 2, "มีค" -> 3, "เมย" -> 4, "พค" -> 5, "มิย" -> 6,
    "กค" -> 7, "สค" -> 8, "กย" -> 9, "ตค" -> 10, "พย" -> 11, "ธค" -> 12)

  def mapThaiMonth(token: String): String = {
    val t = token.trim
    thaiMonths.collectFirst {
      case (m, num) if t.startsWith(m) && t.drop(m.length).forall(_.isDigit)
        && t.length > m.length =>
        val beYear2 = t.drop(m.length).toInt
        val ce = 2500 + beYear2 - 543 // ตค66 → BE 2566 → CE 2023
        f"$ce-$num%02d"
    }.getOrElse(token)
  }

  /** Thai row-type → canonical details value (reference
    * `gpt_excel_fix_column.py:199-204`). Passthrough on no match.
    */
  val typeMap: Map[String, String] = Map(
    "ยอดงบประมาณ" -> "budget",
    "ยอดใช้ไป" -> "spent",
    "ยอดคงเหลือ" -> "remaining")

  def mapType(v: String): String = typeMap.getOrElse(v.trim, v)

  /** Forward-fill a column down rows (reference P11 — pandas `ffill`):
    * pure-Scala pre-ingest version (the in-engine version is the
    * `last(ignoreNulls)` window, see `EventsOps.forwardFill`).
    */
  def forwardFill(values: Vector[Option[String]]): Vector[Option[String]] =
    values.scanLeft(Option.empty[String]) {
      (prev, v) => v.orElse(prev)
    }.drop(1)

  /** Drop columns that are entirely empty below the header (reference P8
    * — pandas `dropna(axis=1, how='all')`).
    */
  def dropAllNullColumns(
      header: Vector[String],
      rows: Vector[Vector[String]]): (Vector[String], Vector[Vector[String]]) = {
    val keep = header.indices.filter(c =>
      rows.exists(r => c < r.length && r(c).trim.nonEmpty)).toVector
    (keep.map(header), rows.map(r => keep.map(c => if (c < r.length) r(c) else "")))
  }
}
