package graft.text

/** Deterministic, dependency-free boilerplate-stripped HTML→text extraction.
  *
  * The reference consumes pre-extracted text; the north rule (BASELINE.json
  * input_hint) additionally requires byte-identical extracted text per url.
  * Per SURVEY.md B8 the extractor itself IS the spec: it is pure, versioned
  * (see [[version]]), and pinned by byte-equality goldens.
  *
  * Contract: `extract(wrap(text)) == text` for every string, and for foreign
  * HTML the function is a reasonable boilerplate stripper (drops head /
  * script / style / comments, strips tags, decodes the five XML entities and
  * numeric character references).
  */
object Html {

  val version = "graft-html-extractor/1"

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: Option[String] = ent match {
            case "amp"  => Some("&")
            case "lt"   => Some("<")
            case "gt"   => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.drop(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Deterministic page synthesis used by tests/benchmarks to derive the
    * `html:binary` column from known text (no external data). */
  def wrap(title: String, text: String): String =
    s"<html><head><title>${escape(title)}</title></head><body><p>${escape(text)}</p></body></html>"

  /** Case-insensitive tag search WITHOUT a toLowerCase copy: toLowerCase
    * can CHANGE STRING LENGTH (U+0130 'İ' → "i̇"), so indexes found in
    * a lowercased copy misalign against the original — silently corrupting
    * extracted text on e.g. Turkish pages, and throwing out-of-bounds when
    * the shift pushes an index past the end (a task abort). regionMatches
    * compares in place, per char, length-stable. The needle is ASCII. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def dropBetween(s: String, openTag: String, closeTag: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.regionMatches(true, i, openTag, 0, openTag.length)) {
        val close = indexOfIgnoreCase(s, closeTag, i)
        i = if (close < 0) s.length else close + closeTag.length
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Boilerplate-stripped text of an HTML page (pure, versioned). */
  def extract(html: String): String = {
    // body-only if a body element exists
    val bodyStart = indexOfIgnoreCase(html, "<body", 0)
    val scoped =
      if (bodyStart >= 0) {
        val open = html.indexOf('>', bodyStart)
        val close = indexOfIgnoreCase(html, "</body", open + 1)
        if (open >= 0 && close > open) html.substring(open + 1, close)
        else if (open >= 0) html.substring(open + 1)
        else html
      } else html
    var s = dropBetween(scoped, "<script", "</script>")
    s = dropBetween(s, "<style", "</style>")
    s = dropBetween(s, "<!--", "-->")
    // strip remaining tags
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '<') {
        val close = s.indexOf('>', i + 1)
        i = if (close < 0) s.length else close + 1
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    unescape(sb.toString)
  }

  def extractBytes(html: Array[Byte]): String =
    extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))
}
