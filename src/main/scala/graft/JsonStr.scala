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

  /** Strict parser for the flat `{"key": "value", ...}` objects the harness
    * writes (Verify's error manifest). A real recursive-descent scan, not a
    * regex: values containing escaped quotes / colons / braces tokenize
    * correctly, and malformed input throws instead of silently dropping
    * entries the compare gate relies on. Values are returned UNESCAPED. */
  def parseFlatObject(s: String): Map[String, String] = {
    var i = 0
    def err(msg: String): Nothing = throw new IllegalArgumentException(
      s"JsonStr.parseFlatObject: $msg at offset $i")
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    def parseString(): String = {
      skipWs()
      if (i >= s.length || s.charAt(i) != '"') err("expected '\"'")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          if (i >= s.length) err("dangling escape")
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              if (i + 4 >= s.length) err("truncated \\u escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => err(s"unknown escape \\$other")
          }
        } else sb += s.charAt(i)
        i += 1
      }
      if (i >= s.length) err("unterminated string")
      i += 1
      sb.toString
    }
    val out = Map.newBuilder[String, String]
    expect('{')
    skipWs()
    if (i < s.length && s.charAt(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = parseString()
        expect(':')
        out += k -> parseString()
        skipWs()
        if (i < s.length && s.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
    }
    skipWs()
    if (i != s.length) err("trailing content after object")
    out.result()
  }
}
