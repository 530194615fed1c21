package graft

/** Minimal JSON string escaping shared by the two driver-contract mains
  * (Verify's oracle_sql.json, Bench's one-line report): backslash, quote,
  * and ALL control chars (<0x20) — a tab or CR in builder-authored SQL
  * would otherwise make the driver's json.load fail and silently zero a
  * round's correctness.
  */
private[graft] object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
