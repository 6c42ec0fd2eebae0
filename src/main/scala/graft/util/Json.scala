package graft.util

/** Minimal JSON string escaping shared by Verify and Bench output. */
object Json {
  /** Escape: backslash, quote, and ALL control chars (<0x20) — a tab or CR
    * in builder-authored SQL would otherwise break the driver's json.load.
    */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
