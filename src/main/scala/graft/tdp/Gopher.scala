package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full Gopher repetition + quality rule family (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", Table A1) — the standard removal filters of production
  * pretraining pipelines:
  *
  * Repetition rules (13):
  *   - duplicate-line / duplicate-paragraph fraction (count)      > 0.30
  *   - duplicate-line / duplicate-paragraph character fraction    > 0.20
  *   - top 2/3/4-gram character fraction            > 0.20 / 0.18 / 0.16
  *   - duplicate 5..10-gram character fraction   > 0.15/0.14/.../0.10
  *
  * Quality rules (7): word count in [50, 100k]; mean word length in
  * [3, 10]; symbol-to-word ratio (#, ..., …) ≤ 0.1; ≤ 90% bullet-starting
  * lines; ≤ 30% ellipsis-ending lines; ≥ 80% of words with an alphabetic
  * character; ≥ 2 of the 8 Gopher stop words present.
  *
  * Semantics notes (each deterministic so the DuckDB oracle can replay it):
  *   - "duplicates" are occurrences beyond the first of an identical
  *     line/paragraph; the char variant weighs them by their length.
  *   - the top-n-gram tie-break is (count desc, n-gram asc in UTF-8 byte
  *     order) — DuckDB's default binary collation, NOT Java's UTF-16
  *     code-unit order (they differ for non-BMP code points).
  *   - duplicate-n-gram char fractions mark the union of word positions
  *     covered by occurrences of any n-gram appearing ≥ 2 times and sum
  *     the lengths of marked words — the paper's "taking care not to count
  *     characters in overlapping n-grams more than once".
  *   - all fractions are single int/int double divisions ⇒ IEEE-identical
  *     across engines.
  *
  * Both operators are pure per-document narrow maps — no shuffle; at
  * 100 TB they run at scan speed with column pruning, exactly like
  * [[TextStats.quality]].
  */
object Gopher {

  /** Deterministic document structure for line/paragraph rules when the
    * input is single-line text: 8-word lines, 3-line paragraphs. Multi-line
    * text takes the real corpus path instead: lines split on '\n',
    * paragraphs on '\n\n' (blank-line boundaries), words on whitespace —
    * the structure an actual crawl carries. Both paths are relationally
    * replayable (string_split is LTR non-overlapping on both engines, and
    * re-joining the split always reconstructs the original). */
  val LineWords = 8
  val ParaLines = 3

  final case class Structure(words: Array[String], lines: Array[String],
      paras: Array[String], text: String)

  def structure(rawText: String): Structure =
    if (rawText.indexOf('\n') >= 0) {
      // -1 limit: keep trailing empty tokens, matching SQL string_split;
      // word list flattens newlines to spaces (consecutive '\n's yield
      // empty words on BOTH engines — symmetric, zero char mass)
      val words = rawText.replace('\n', ' ').split(" ", -1)
      val lines = rawText.split("\n", -1)
      val paras = rawText.split("\n\n", -1)
      Structure(words, lines, paras, rawText)
    } else {
      val words = rawText.split(" ", -1)
      val lines = words.grouped(LineWords).map(_.mkString(" ")).toArray
      val paras = lines.grouped(ParaLines).map(_.mkString("\n")).toArray
      Structure(words, lines, paras, paras.mkString("\n\n"))
    }

  /** Code-point count (== DuckDB length(); Java String.length counts UTF-16
    * units, which diverges for non-BMP text). All char masses below use
    * code points so every fraction matches the relational replay on any
    * Unicode input, not just ASCII. */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** UTF-8 byte-order comparison (== DuckDB's binary VARCHAR collation). */
  private def utf8Less(a: String, b: String): Boolean =
    graft.util.Utf8Order.less(a, b)

  /** (duplicate occurrences beyond the first, their summed char length). */
  private def dupStats(items: Array[String]): (Long, Long) = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach(s => counts(s) = counts.getOrElse(s, 0L) + 1L)
    var dupCount = 0L
    var dupChars = 0L
    counts.foreach { case (s, c) =>
      if (c > 1) { dupCount += c - 1; dupChars += (c - 1) * cpLen(s) }
    }
    (dupCount, dupChars)
  }

  /** Interned per-doc word view (r8): word → dense int id plus a
    * code-point-length prefix sum. The nine n-gram rules below used to
    * build a java String for EVERY gram position of EVERY pass (≈ 9·W
    * string concatenations per document — the measured top CPU cost of the
    * gopher rows); over ids, counting is integer compares and the only
    * strings ever built are top-gram TIE candidates, whose comparison
    * stays the exact joined-string UTF-8 order the oracle replays. */
  private final class WordIds(val words: Array[String]) {
    val ids = new Array[Int](words.length)
    val cpPrefix = new Array[Long](words.length + 1)
    locally {
      val idOf = new java.util.HashMap[String, Integer](words.length * 2)
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var id = idOf.get(w)
        if (id == null) { id = Integer.valueOf(idOf.size); idOf.put(w, id) }
        ids(i) = id.intValue
        cpPrefix(i + 1) = cpPrefix(i) + cpLen(w)
        i += 1
      }
    }
    /** code points of the space-joined gram at [i, i+n) */
    def gramCpLen(i: Int, n: Int): Long = cpPrefix(i + n) - cpPrefix(i) + (n - 1)
    def gramString(i: Int, n: Int): String = {
      val sb = new java.lang.StringBuilder
      var k = i
      while (k < i + n) { if (k > i) sb.append(' '); sb.append(words(k)); k += 1 }
      sb.toString
    }
  }

  /** Exact open-addressing count of the n-grams of `ids`: returns
    * (slotOfPos, slotCount, slotFirstPos1) where slotFirstPos1 holds the
    * first occurrence position + 1 (0 = empty slot). Collisions resolve by
    * comparing the id slices — never by hash alone, so counts are exact. */
  private def countGrams(ids: Array[Int], n: Int): (Array[Int], Array[Int], Array[Int]) = {
    val m = ids.length - n + 1
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val firstPos1 = new Array[Int](cap)
    val cnt = new Array[Int](cap)
    val slotOf = new Array[Int](m)
    val mask = cap - 1
    var i = 0
    while (i < m) {
      var h = 1L
      var j = i
      while (j < i + n) { h = h * 0x9E3779B97F4A7C15L + ids(j); j += 1 }
      h ^= (h >>> 32)
      var s = (h & mask).toInt
      var found = -1
      while (found < 0) {
        if (firstPos1(s) == 0) { firstPos1(s) = i + 1; found = s }
        else {
          val p = firstPos1(s) - 1
          var k = 0
          while (k < n && ids(p + k) == ids(i + k)) k += 1
          if (k == n) found = s
          else s = (s + 1) & mask
        }
      }
      cnt(found) += 1
      slotOf(i) = found
      i += 1
    }
    (slotOf, cnt, firstPos1)
  }

  private def topNgramChars(w: WordIds, n: Int): Long = {
    if (w.words.length < n) return 0L
    val m = w.words.length - n + 1
    val (slotOf, cnt, firstPos1) = countGrams(w.ids, n)
    var bc = 0
    var bestPos = -1
    var best: String = null // built lazily, only for ties
    var i = 0
    while (i < m) {
      val s = slotOf(i)
      if (firstPos1(s) - 1 == i) { // distinct-gram representative
        val c = cnt(s)
        if (c > bc) { bc = c; bestPos = i; best = null }
        else if (c == bc) {
          if (best == null) best = w.gramString(bestPos, n)
          val cand = w.gramString(i, n)
          if (utf8Less(cand, best)) { best = cand; bestPos = i }
        }
      }
      i += 1
    }
    bc.toLong * w.gramCpLen(bestPos, n)
  }

  private def dupNgramCharsIds(w: WordIds, n: Int): Long = {
    if (w.words.length < n) return 0L
    val m = w.words.length - n + 1
    val (slotOf, cnt, _) = countGrams(w.ids, n)
    val covered = new Array[Boolean](w.words.length)
    var i = 0
    while (i < m) {
      if (cnt(slotOf(i)) >= 2) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var chars = 0L
    i = 0
    while (i < covered.length) {
      if (covered(i)) chars += w.cpPrefix(i + 1) - w.cpPrefix(i)
      i += 1
    }
    chars
  }

  /** count(top n-gram) * charLength(top n-gram); 0 when no n-grams. */
  private[graft] def topNgramChars(words: Array[String], n: Int): Long =
    if (words.length < n) 0L else topNgramChars(new WordIds(words), n)

  /** Summed length of words at positions covered by any occurrence of an
    * n-gram appearing ≥ 2 times (positions counted once). */
  private[graft] def dupNgramChars(words: Array[String], n: Int): Long =
    if (words.length < n) 0L else dupNgramCharsIds(new WordIds(words), n)

  // published removal thresholds, rule-keyed
  val DupLineFracT = 0.30
  val DupParaFracT = 0.30
  val DupLineCharFracT = 0.20
  val DupParaCharFracT = 0.20
  val TopGramT: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DupGramT: Map[Int, Double] =
    Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  final case class RepetitionRow(
      doc_id: Long, n_words: Long, total_chars: Long,
      dup_line_frac: Double, dup_line_char_frac: Double,
      dup_para_frac: Double, dup_para_char_frac: Double,
      top_2gram_char_frac: Double, top_3gram_char_frac: Double,
      top_4gram_char_frac: Double,
      dup_5gram_char_frac: Double, dup_6gram_char_frac: Double,
      dup_7gram_char_frac: Double, dup_8gram_char_frac: Double,
      dup_9gram_char_frac: Double, dup_10gram_char_frac: Double,
      repetitive: Boolean)

  def repetitionRow(docId: Long, text: String): RepetitionRow = {
    val st = structure(text)
    val totalChars = cpLen(st.text)
    def cfrac(chars: Long): Double =
      if (totalChars == 0) 0.0 else chars.toDouble / totalChars
    val (dupLines, dupLineChars) = dupStats(st.lines)
    val (dupParas, dupParaChars) = dupStats(st.paras)
    val dupLineFrac = dupLines.toDouble / st.lines.length
    val dupParaFrac = dupParas.toDouble / st.paras.length
    // one interned word view shared by all nine n-gram rules (r8)
    val w = new WordIds(st.words)
    val top = (2 to 4).map(n =>
      n -> cfrac(if (st.words.length < n) 0L else topNgramChars(w, n))).toMap
    val dup = (5 to 10).map(n =>
      n -> cfrac(if (st.words.length < n) 0L else dupNgramCharsIds(w, n))).toMap
    val repetitive =
      dupLineFrac > DupLineFracT || dupParaFrac > DupParaFracT ||
      cfrac(dupLineChars) > DupLineCharFracT ||
      cfrac(dupParaChars) > DupParaCharFracT ||
      (2 to 4).exists(n => top(n) > TopGramT(n)) ||
      (5 to 10).exists(n => dup(n) > DupGramT(n))
    RepetitionRow(docId, st.words.length.toLong, totalChars,
      dupLineFrac, cfrac(dupLineChars), dupParaFrac, cfrac(dupParaChars),
      top(2), top(3), top(4),
      dup(5), dup(6), dup(7), dup(8), dup(9), dup(10), repetitive)
  }

  /** All 13 Gopher repetition-rule statistics per document. */
  def repetition(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) => repetitionRow(id, t) }
      .toDF()
      .orderBy($"doc_id")
  }

  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def hasAsciiAlpha(w: String): Boolean =
    w.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))

  /** Non-overlapping left-to-right occurrence count (== Python str.count
    * and len(string_split(s, sub)) - 1 in DuckDB). */
  private[graft] def countOcc(text: String, sub: String): Long = {
    var i = 0
    var c = 0L
    var j = text.indexOf(sub, i)
    while (j >= 0) { c += 1; i = j + sub.length; j = text.indexOf(sub, i) }
    c
  }

  final case class QualityRow(
      doc_id: Long, n_words: Long, mean_word_len: Double,
      symbol_word_ratio: Double, bullet_line_frac: Double,
      ellipsis_line_frac: Double, alpha_word_frac: Double,
      n_stop_words: Long, quality_keep: Boolean)

  def qualityRow(docId: Long, text: String): QualityRow = {
    val st = structure(text)
    val nWords = st.words.length.toLong
    val meanLen = st.words.map(cpLen).sum.toDouble / nWords
    val nSymbols = countOcc(text, "#") + countOcc(text, "...") + countOcc(text, "…")
    val symbolRatio = nSymbols.toDouble / nWords
    def ltrimmed(s: String) = s.dropWhile(_ == ' ')
    def rtrimmed(s: String) = {
      var e = s.length
      while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
      s.substring(0, e)
    }
    val nBullet = st.lines.count { l =>
      val t = ltrimmed(l); t.startsWith("-") || t.startsWith("•")
    }
    val nEllipsis = st.lines.count { l =>
      val t = rtrimmed(l); t.endsWith("...") || t.endsWith("…")
    }
    val bulletFrac = nBullet.toDouble / st.lines.length
    val ellipsisFrac = nEllipsis.toDouble / st.lines.length
    val alphaFrac = st.words.count(hasAsciiAlpha).toDouble / nWords
    val wordSet = st.words.toSet
    val nStop = StopWords.count(wordSet.contains).toLong
    val keep =
      nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 &&
      bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      alphaFrac >= 0.8 && nStop >= 2
    QualityRow(docId, nWords, meanLen, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, nStop, keep)
  }

  /** The 7 Gopher quality rules per document. */
  def quality(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) => qualityRow(id, t) }
      .toDF()
      .orderBy($"doc_id")
  }
}
