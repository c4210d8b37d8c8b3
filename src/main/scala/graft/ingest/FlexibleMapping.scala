package graft.ingest

/** LLM-assisted flexible column/value mapping for spreadsheet ingest
  * (reference `gpt_excel_flexible_column.py:13-43` column mapping,
  * `:46-87` data-value mapping, `:90-131` structure analysis) — the
  * last LLM seam, closed to its boundary like [[graft.serving.NlQueryLoop]]:
  * everything deterministic lives here (dictionary-first resolution,
  * markdown-fence stripping, strict JSON parsing, snake_case
  * sanitation, collision dedupe, null-tolerant structure decode), and
  * the three model calls are injected hooks a production deployment
  * binds to a client and the spec binds to deterministic fakes.
  *
  * Resolution order is DICTIONARY FIRST: names/values the static maps
  * ([[HeaderFlatten.mapThaiMonth]], [[HeaderFlatten.typeMap]], the
  * caller's rename dictionary) already cover are never sent to the
  * model — the hook only sees the UNKNOWN remainder, so a model outage
  * degrades to exactly the reference's deterministic pipeline and the
  * model can never override a curated mapping.
  */
object FlexibleMapping {

  /** The three model calls of the reference module. Each receives the
    * unknown items and returns a JSON object as TEXT (possibly
    * markdown-fenced — models do that; the reference strips fences,
    * `gpt_excel_flexible_column.py:38-42`).
    */
  final case class Hooks(
      columnMapping: Seq[String] => String,
      valueMapping: Seq[String] => String,
      analyzeStructure: (Seq[String], Map[String, Seq[String]]) => String)

  /** Strip markdown code fences the way the reference does: drop every
    * line that starts with ``` and keep the rest.
    */
  def stripFences(s: String): String =
    s.linesIterator.filterNot(_.trim.startsWith("```")).mkString("\n").trim

  /** Strict parser for the FLAT JSON object the hooks must return:
    * string keys, string-or-null values, no nesting (the structure
    * hook's one nested object is handled by [[parseStructure]]).
    * Malformed model output fails loudly here instead of silently
    * corrupting a mapping.
    */
  def parseFlatObject(text: String): Map[String, Option[String]] = {
    val s = stripFences(text)
    var i = 0
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad mapping JSON at $i: $msg in ${s.take(120)}")
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { ws(); if (i >= s.length || s(i) != c) err(s"expected '$c'"); i += 1 }
    def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          if (i >= s.length) err("dangling escape")
          s(i) match {
            case '"' => b += '"'; case '\\' => b += '\\'; case '/' => b += '/'
            case 'n' => b += '\n'; case 'r' => b += '\r'; case 't' => b += '\t'
            case 'b' => b += '\b'; case 'f' => b += '\f'
            case 'u' =>
              if (i + 4 >= s.length) err("short \\u escape")
              b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => err(s"unknown escape \\$c")
          }
        } else b += s(i)
        i += 1
      }
      expect('"')
      b.result()
    }
    expect('{')
    val out = Map.newBuilder[String, Option[String]]
    ws()
    if (i < s.length && s(i) == '}') { i += 1 }
    else {
      var more = true
      while (more) {
        val k = str()
        expect(':')
        ws()
        val v =
          if (s.startsWith("null", i)) { i += 4; None }
          else Some(str())
        out += k -> v
        ws()
        if (i < s.length && s(i) == ',') { i += 1; more = true }
        else { expect('}'); more = false }
      }
    }
    ws()
    if (i != s.length) err("trailing content")
    out.result()
  }

  /** Reference rule 1: snake_case only. Model output is sanitized, not
    * trusted — lowercase, non-alphanumerics collapse to `_`, trimmed.
    */
  def toSnakeCase(name: String): String = {
    val flat = name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    if (flat.isEmpty) "col" else flat
  }

  /** Column-name mapping, dictionary first: `known` (the curated
    * Thai→English rename map) resolves directly; only the unknown
    * remainder goes to the model, whose answers are fence-stripped,
    * JSON-parsed, snake_cased, and collision-deduped with the same
    * `_2`-suffix rule as [[HeaderFlatten.dedupeNames]]. A name the
    * model omits or nulls passes through snake_cased — same
    * passthrough posture as the deterministic maps.
    */
  def mapColumns(cols: Seq[String], known: Map[String, String],
      hooks: Hooks): Map[String, String] = {
    val unknown = cols.filterNot(known.contains).distinct
    val model: Map[String, Option[String]] =
      if (unknown.isEmpty) Map.empty
      else parseFlatObject(hooks.columnMapping(unknown))
    val raw = cols.distinct.map { c =>
      c -> known.getOrElse(c,
        toSnakeCase(model.get(c).flatten.getOrElse(c)))
    }
    // collision dedupe in input order: first keeps the name, later
    // duplicates get _2, _3, …
    val seen = scala.collection.mutable.Map.empty[String, Int]
    raw.map { case (c, n) =>
      val k = seen.getOrElse(n, 0) + 1
      seen(n) = k
      c -> (if (k == 1) n else s"${n}_$k")
    }.toMap
  }

  /** Cell-value mapping, dictionary first: Thai months and row types
    * resolve through the deterministic maps; only values BOTH miss go
    * to the model (reference rule 5: already-clean values are not in
    * the mapping — such values pass through).
    */
  def mapValues(values: Seq[String], hooks: Hooks): Map[String, String] = {
    val det = values.distinct.map { v =>
      val m = HeaderFlatten.mapThaiMonth(v)
      v -> (if (m != v) m else HeaderFlatten.mapType(v))
    }.toMap
    val unknown = values.distinct.filter(v => det(v) == v)
    val model: Map[String, Option[String]] =
      if (unknown.isEmpty) Map.empty
      else parseFlatObject(hooks.valueMapping(unknown))
    det.map { case (v, d) =>
      v -> (if (d != v) d else model.get(v).flatten.getOrElse(v))
    }
  }

  /** The structure-analysis answer (reference `:90-131`): which column
    * holds the month, which the row type, and what the type values
    * mean. Absent/null answers decode to None/empty — the caller falls
    * back to the fixed-layout assumption.
    */
  final case class Structure(monthColumn: Option[String],
      typeColumn: Option[String], typeValues: Map[String, String])

  def analyzeStructure(cols: Seq[String],
      sample: Map[String, Seq[String]], hooks: Hooks): Structure = {
    val s = stripFences(hooks.analyzeStructure(cols, sample))
    // the one nested field: locate the type_values OBJECT (if the model
    // answered `null` there is nothing to cut), parse it separately,
    // and hand the outer text to the flat parser with the object
    // replaced by null
    val objSpan: Option[(Int, Int)] = {
      val k = s.indexOf("\"type_values\"")
      if (k < 0) None
      else {
        var i = s.indexOf(':', k)
        if (i < 0) None
        else {
          i += 1
          while (i < s.length && s(i).isWhitespace) i += 1
          if (i >= s.length || s(i) != '{') None // value is null/absent
          else {
            val close = s.indexOf('}', i)
            if (close < 0) None else Some((i, close))
          }
        }
      }
    }
    val inner = objSpan match {
      case Some((open, close)) => parseFlatObject(s.substring(open, close + 1))
      case None => Map.empty[String, Option[String]]
    }
    val outerText = objSpan match {
      case Some((open, close)) =>
        s.substring(0, open) + "null" + s.substring(close + 1)
      case None => s
    }
    val outer = parseFlatObject(outerText)
    Structure(
      outer.get("month_column").flatten,
      outer.get("type_column").flatten,
      inner.collect { case (k, Some(v)) => k -> v })
  }
}
