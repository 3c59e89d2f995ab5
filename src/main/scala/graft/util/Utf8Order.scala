package graft.util

/** UTF-8 byte-order string comparison — equal to Unicode code-point order
  * (UTF-8 preserves it) and to DuckDB's binary VARCHAR collation, but NOT
  * to Java String.compareTo (UTF-16 code units sort surrogate pairs before
  * U+E000..U+FFFF). Every cross-engine deterministic tie-break in the repo
  * goes through this one definition. */
object Utf8Order {

  def less(a: String, b: String): Boolean = compare(a, b) < 0

  def compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  implicit val ordering: Ordering[String] = (a, b) => compare(a, b)
}
