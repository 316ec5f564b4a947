package graft

/** Minimal JSON string escaping shared by the harness mains (Verify's
  * oracle dump, Bench's error map). Escapes backslash, quote, and ALL
  * control chars (<0x20) — a tab or CR in builder-authored SQL or an
  * exception message would otherwise break the driver's json.load.
  */
private[graft] object JsonStr {
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
