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

  /** The reference workbooks' flattened-Thai-header → English column
    * dictionary (P10 — `gpt_excel_fix_column.py:133-187`, verbatim keys:
    * they are the exact strings the 4-row header flatten produces on the
    * finance spreadsheets). Unmapped columns pass through and are
    * reported by [[normalize]] like the reference's "columns still Thai"
    * warning.
    */
  val columnRenameMap: Map[String, String] = Map(
    "ว/ด/ป" -> "month",
    "จำนวนเงินรวม" -> "total_amount",
    "รายละเอียด" -> "type",
    // general fund / general administration
    "กองทุนทั่วไป งานบริหารทั่วไป_เงินอุดหนุน_wifi" -> "general_subsidy_wifi",
    "ค่าตอบแทน_งบประจำ" -> "general_compensation",
    "ค่าใช้สอย_งบประจำ" -> "general_service",
    "ค่าวัสดุ_งบประจำ" -> "general_material",
    "ค่าสาธารณูปโภค" -> "general_utility",
    "เงินอุดหนุน_(สวัสดิการและสุขภาพบุคลากร)" -> "general_welfare",
    "เงินอุดหนุน_MS 365" -> "general_ms365",
    // education fund
    "กองทุนเพื่อการศึกษา_งานบริการคอมพิวเตอร์ทางวิชาการ_เงินเดือน_พนง.เงินรายได้(S)" -> "education_salary_income",
    "พนง.เงินแผ่นดิน" -> "education_salary_gov",
    // fixed-asset fund
    "กองทุนสินทรัพย์ถาวร_งานบริการคอมพิวเตอร์ทางวิชาการ_ค่าครุภัณฑ์_(วงเงินไม่เกิน 1ล้าน)  งบประจำ" -> "asset_equipment_under1m",
    "ค่าครุภัณฑ์_(วงเงินเกิน 1ล้าน)  งบประจำ" -> "asset_equipment_over1m",
    "กองทุนสินทรัพย์ถาวร-ที่ดินและสิ่งก่อสร้าง" -> "asset_land_building",
    "ครุภัณฑ์_Firewall" -> "asset_firewall",
    "เงินอุดหนุน_SIEM" -> "asset_siem",
    "เงินอุดหนุน_data center" -> "asset_datacenter",
    "เงินอุดหนุน_wifi satit" -> "asset_wifi_satit",
    // research fund
    "กองทุนเพื่อการวิจัย_งานบริหารการวิจัย_วิจัยบุคลากร_เงินอุดหนุนทั่วไป" -> "research_subsidy",
    // reserve fund
    "กองทุนสำรอง_งานบริหารทั่วไป-รายจ่ายอื่น_สำรองจ่าย" -> "reserve_expense",
    "สบทบกองทุนพัฒนา" -> "reserve_dev_fund",
    "สมทบกองทุนพัฒนาบุคลากร มช" -> "reserve_staff_fund",
    // staff-development fund
    "กองทุนพัฒนาบุคลากร_งานสนับสนุนการจัดการศึกษา_อุดหนุนเฉพาะกิจ" -> "development_specific",
    // arts-preservation fund
    "กองทุนทำนุบำรุงศิลปะ_งานทำนุฯ_อุดหนุนทั่วไป" -> "culture_subsidy",
    // IT projects
    "Wifi@Jumboplus" -> "it_wifi_jumbo",
    "Firewall" -> "it_firewall",
    "CMU Cloud" -> "it_cmu_cloud",
    "SiEM" -> "it_siem",
    "Digital Health" -> "it_digital_health",
    "ระบบการขอเข้าทำประโยชน์" -> "it_access_system",
    "UPS" -> "it_ups",
    "เช่าUPS+ดูแลwifi" -> "it_ups_rental",
    "Uplift" -> "it_uplift",
    "Open data" -> "it_open_data")

  /** Valid row types after [[mapType]] (reference `:206-208`). */
  val validTypes: Set[String] = Set("budget", "spent", "remaining")

  /** Normalized sheet: English header + data rows. */
  final case class Normalized(
      header: Vector[String],
      rows: Vector[Vector[String]],
      unmappedColumns: Vector[String])

  /** The reference's full sheet → wide-CSV normalization
    * (`gpt_excel_fix_column.py:77-220`), composed from the parts above:
    * merged-cell fill → 4-row header flatten → `col_N` naming for blank
    * headers → duplicate suffixes → drop all-empty and unnamed columns →
    * Thai→English rename → month/type remap → keep budget/spent/remaining
    * rows → forward-fill month. Feed it an [[XlsxGrid.Sheet]] to go from
    * a real .xlsx to ingest-ready rows.
    */
  def normalize(sheet: XlsxGrid.Sheet, headerRows: Int = 4): Normalized = {
    val grid = fillMerged(sheet.grid, sheet.merges)
    val flat = flattenHeader(grid, headerRows)
    val named = dedupeNames(flat.zipWithIndex.map {
      case ("", i) => s"col_$i"
      case (h, _) => h
    })
    val data = grid.drop(headerRows)
    val (h1, r1) = dropAllNullColumns(named, data)
    val keep = h1.indices.filter(c => !h1(c).startsWith("col_")).toVector
    val h2 = keep.map(h1).map(n => columnRenameMap.getOrElse(n, n))
    val r2 = r1.map(r => keep.map(r))
    val monthIdx = h2.indexOf("month")
    val typeIdx = h2.indexOf("type")
    val typed = r2.map(_.zipWithIndex.map { case (v, i) =>
      if (i == monthIdx) mapThaiMonth(v)
      else if (i == typeIdx) mapType(v)
      else v
    })
    val valid =
      if (typeIdx < 0) typed
      else typed.filter(r => validTypes.contains(r(typeIdx)))
    val filled =
      if (monthIdx < 0) valid
      else {
        val months = forwardFill(valid.map(r =>
          Option(r(monthIdx)).map(_.trim).filter(_.nonEmpty)))
        valid.zip(months).map { case (r, m) =>
          r.updated(monthIdx, m.getOrElse(""))
        }
      }
    // Thai Unicode block U+0E00..U+0E7F, like the reference's warning scan
    Normalized(h2, filled,
      h2.filter(_.exists(ch => ch >= 0x0e00.toChar && ch <= 0x0e7f.toChar)))
  }
}
