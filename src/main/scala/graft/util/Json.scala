package graft.util

/** Minimal JSON emission helpers shared by the driver-contract mains
  * (Verify, VerifySubset, Bench) — no library dependency, locale-free.
  */
object Json {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale-independent fixed-point number (the f"" interpolator honors
    * the default locale; a comma decimal separator corrupts the JSON). */
  def num(v: Double, decimals: Int = 3): String = {
    // a non-finite input means the measurement itself is broken
    // (zero-rate division in Scaling/Bench): fail loudly rather than
    // publish NaN as "0.0" / ±Infinity as ±9.2e15 — plausible-looking
    // numbers that would silently corrupt the round artifact
    require(v.isFinite, s"non-finite value fed to Json.num: $v")
    val p = math.pow(10, decimals)
    (math.round(v * p) / p).toString
  }
}
