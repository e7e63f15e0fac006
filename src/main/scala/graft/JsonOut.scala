package graft

/** JSON string escaping shared by the driver-contract mains (Verify's
  * oracle_sql.json and Bench's metric line): backslash, quote, and ALL
  * control chars — a tab in builder-authored SQL or a backslash in an
  * env-supplied path would otherwise make the driver's json.load fail and
  * silently zero a round's results.
  */
object JsonOut {
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
