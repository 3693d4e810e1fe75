package graft.util

/** Shared JSON string escaping for the driver-facing JSON lines (Verify's
  * oracle_sql.json and Bench's metrics line). One implementation: a past
  * escaping gap in one of two hand-rolled copies silently zeroed a round's
  * correctness, so there is exactly one now. Escapes backslash, quote, and
  * ALL control chars (<0x20). */
object Json {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
