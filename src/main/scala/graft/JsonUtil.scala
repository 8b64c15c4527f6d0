package graft

/** Shared JSON string escaping for the two driver mains (Bench's metric
  * line, Verify's oracle_sql.json). One implementation: backslash,
  * quote, and EVERY control char below 0x20 — a tab or CR in
  * builder-authored SQL would otherwise make the driver's json.load
  * fail and silently zero the round's correctness.
  */
object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
