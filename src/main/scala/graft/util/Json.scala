package graft.util

/** Minimal JSON string quoting shared by every hand-authored sidecar/dump
  * (Verify's oracle_sql.json, Versioning's _version.json): backslash,
  * quote, and ALL control chars (<0x20) are escaped so a stray tab, CR,
  * or quoted path can never produce invalid JSON.
  */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
