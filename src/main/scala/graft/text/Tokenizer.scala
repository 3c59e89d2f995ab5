package graft.text

import graft.model.CharSpan

/** Deterministic regex-free tokenizer + sentence splitter.
  *
  * The reference uses a customized spaCy English tokenizer only for (a) token
  * boundary sets consumed by the trie matcher's `word_is_valid` check
  * (kazu/steps/joint_ner_and_linking/memory_efficient_string_matching.py:174-178,
  * kazu/utils/utils.py:204-207) and (b) sentence spans. We re-implement that
  * contract directly (SURVEY.md B5/B6): no NLP dependency, bit-stable output.
  *
  * Tokenization spec (mirrors the reference's two deliberate customizations,
  * kazu/utils/spacy_pipeline.py:41-69):
  *   - a token is a maximal run of Unicode letters/digits, where a single
  *     dash codepoint between two letter/digit chars does NOT split
  *     (intra-word hyphens kept: "ALK-Abello" is one token);
  *   - '.' between two digits does not split ("3.5");
  *   - every other non-space character is its own single-char token
  *     (brackets, slashes and sentence-final '.' are boundaries, so
  *     "(EGFR)" yields a valid "EGFR" hit and "Haemophilia A." a valid "A").
  */
object Tokenizer {

  final case class Token(start: Int, end: Int) // half-open [start, end)

  @inline private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** Single-entry identity memo per thread: pipeline stages tokenize the
    * SAME section-text String instance back-to-back (trie boundaries,
    * wordpieces, abbreviation scan, class filter) — the memo collapses those
    * repeat scans without holding references beyond the current document. */
  private val lastTokenized = new ThreadLocal[(String, Array[Token])]

  def tokenize(text: String): Array[Token] = {
    val memo = lastTokenized.get()
    if (memo != null && (memo._1 eq text)) return memo._2
    val result = tokenizeUncached(text)
    lastTokenized.set((text, result))
    result
  }

  private def tokenizeUncached(text: String): Array[Token] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) { i += 1 }
      else if (isWordChar(c)) {
        val start = i
        i += 1
        var continue = true
        while (continue && i < n) {
          val ci = text.charAt(i)
          if (isWordChar(ci)) i += 1
          else if ((Normalizer.Dashes.contains(ci) || ci == '.') &&
                   i + 1 < n && isWordChar(text.charAt(i + 1)) &&
                   (ci != '.' || (Character.isDigit(text.charAt(i - 1)) &&
                                  Character.isDigit(text.charAt(i + 1))))) {
            i += 2 // joiner plus the word char after it
          } else continue = false
        }
        out += Token(start, i)
      } else {
        out += Token(i, i + 1)
        i += 1
      }
    }
    out.toArray
  }

  /** Token boundary sets for `wordIsValid` — `starts` marks token start
    * offsets, `ends` marks INCLUSIVE end offsets (matching the reference's
    * `tok.idx + len(tok) - 1`). BitSets: O(1) checks, no boxing — this is
    * on the per-page hot path of the trie scan. */
  def boundaries(text: String): (java.util.BitSet, java.util.BitSet) = {
    val starts = new java.util.BitSet(text.length + 1)
    val ends = new java.util.BitSet(text.length + 1)
    tokenize(text).foreach { t =>
      starts.set(t.start); ends.set(t.end - 1)
    }
    (starts, ends)
  }

  /** Ref: kazu/utils/utils.py:204-207. */
  @inline def wordIsValid(
      startChar: Int,
      endCharInclusive: Int,
      starts: java.util.BitSet,
      ends: java.util.BitSet
  ): Boolean =
    startChar >= 0 && starts.get(startChar) && ends.get(endCharInclusive)

  private val sentenceEnders: Set[Char] = Set('.', '!', '?')

  /** Rule sentence splitter (role of spaCy's `sentencizer` in the reference
    * basic pipeline, kazu/utils/spacy_pipeline.py:81-85): a sentence ends
    * after a run of [.!?] followed by whitespace or end-of-text. Spans cover
    * the whole text (trailing non-terminated text is a final sentence).
    */
  def sentenceSpans(text: String): Seq[CharSpan] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[CharSpan]
    val n = text.length
    var sentStart = 0
    var i = 0
    while (i < n) {
      if (sentenceEnders.contains(text.charAt(i))) {
        var j = i + 1
        while (j < n && sentenceEnders.contains(text.charAt(j))) j += 1
        if (j >= n || Character.isWhitespace(text.charAt(j))) {
          out += CharSpan(sentStart, j)
          while (j < n && Character.isWhitespace(text.charAt(j))) j += 1
          sentStart = j
          i = j
        } else i = j
      } else i += 1
    }
    if (sentStart < n) out += CharSpan(sentStart, n)
    out.toSeq
  }
}
