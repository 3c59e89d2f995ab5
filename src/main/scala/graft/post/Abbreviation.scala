package graft.post

import graft.model._
import graft.text.{Normalizer, Tokenizer}

/** Schwartz–Hearst abbreviation detection + document-global entity
  * propagation (ref AbbreviationFinderStep + KazuAbbreviationDetector,
  * kazu/utils/abbreviation_detector.py:88-448, itself derived from scispacy;
  * algorithm: Schwartz & Hearst 2003).
  *
  * Document-local: detect (long form → short form) pairs at parenthesis
  * sites, then across ALL sections replace any entity sitting exactly on an
  * occurrence of the short form with copies of the long form's entities
  * (at HIGHLY_LIKELY confidence). Pure function over the doc row.
  */
object Abbreviation {

  val Namespace = "AbbreviationFinder"

  final case class Pair(longStart: Int, longEnd: Int, shortTokens: Seq[String])

  /** Schwartz–Hearst char-backward matching
    * (ref find_abbreviation, abbreviation_detector.py:95-152).
    * Inputs are token text sequences; returns the long-form token start
    * index (within longTokens) or None.
    */
  def findAbbreviation(longTokens: IndexedSeq[String], shortTokens: Seq[String]): Option[Int] = {
    val longForm = longTokens.mkString(" ")
    val shortForm = shortTokens.mkString(" ")
    var longIndex = longForm.length - 1
    var shortIndex = shortForm.length - 1
    while (shortIndex >= 0) {
      val currentChar = Character.toLowerCase(shortForm.charAt(shortIndex))
      if (!Character.isLetterOrDigit(currentChar)) {
        shortIndex -= 1
      } else {
        while (longIndex >= 0 &&
               (Character.toLowerCase(longForm.charAt(longIndex)) != currentChar ||
                (shortIndex == 0 && longIndex > 0 &&
                 Character.isLetterOrDigit(longForm.charAt(longIndex - 1))))) {
          longIndex -= 1
        }
        if (longIndex < 0) return None
        longIndex -= 1
        shortIndex -= 1
      }
    }
    longIndex += 1
    // translate char index back to the first token starting after it
    var wordLengths = 0
    var i = 0
    while (i < longTokens.length) {
      wordLengths += longTokens(i).length + 1 // joined with single spaces
      if (wordLengths > longIndex) return Some(i)
      i += 1
    }
    None
  }

  /** Ref short_form_filter (abbreviation_detector.py:200-217). */
  def shortFormFilter(tokens: Seq[String]): Boolean = {
    if (!tokens.forall(t => t.length >= 2 && t.length < 10)) return false
    val text = tokens.mkString(" ")
    if (text.isEmpty) return false
    if (text.count(_.isLetter).toDouble / text.length < 0.5) return false
    text.charAt(0).isLetter
  }

  private final case class TokText(tokens: Array[Tokenizer.Token], texts: Array[String])
  private def tokTexts(text: String): TokText = {
    val toks = Tokenizer.tokenize(text)
    TokText(toks, toks.map(t => text.substring(t.start, t.end)))
  }

  /** Detect candidate (long, short) pairs in one section
    * (ref filter_matches, abbreviation_detector.py:155-196; paren spans come
    * exclusive of brackets, :437-441, and the maximal span per bracket pair
    * is used). Returns (longTokenRange, shortTokenRange) pairs.
    */
  private def candidates(tt: TokText): Seq[((Int, Int), (Int, Int))] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[((Int, Int), (Int, Int))]
    var i = 0
    while (i < tt.texts.length) {
      if (tt.texts(i) == "(") {
        var j = i + 1
        while (j < tt.texts.length && tt.texts(j) != ")") j += 1
        if (j < tt.texts.length && j > i + 1) {
          val start = i + 1 // exclusive of '('
          val end = j       // exclusive bound
          val len = end - start
          if (len <= 8 && start != 1) {
            if (len > 3) {
              // long form inside parens; short form is the word before '('
              // (ref doc[start-2 : start-1] with start = first content token)
              if (i >= 1)
                out += (((start, end), (i - 1, i)))
            } else {
              val abbrevLength = (start until end).map(tt.texts(_).length).sum
              val maxWords = math.min(abbrevLength + 5, abbrevLength * 2)
              val longStart = math.max(start - maxWords - 1, 0)
              // long candidate = doc[longStart : start-1] = tokens before '('
              if (i > longStart)
                out += (((longStart, i), (start, end)))
            }
          }
          i = j
        }
      }
      i += 1
    }
    // the reference swaps: filter_matches emits (long, short) with the
    // roles already resolved; apply the short-form filter here
    out.toSeq.filter { case (_, (ss, se)) =>
      shortFormFilter((ss until se).map(tt.texts(_)))
    }
  }

  def processDoc(doc: KDoc): KDoc = processDoc(doc, Set.empty)

  /** @param excludeAbbrvs detected abbreviations whose existing entity
    *   match text is in this set are NOT removed, even when the long form
    *   contributes no source entities (ref KazuAbbreviationDetector
    *   exclude_abbrvs, abbreviation_detector.py:244-253, :348-360 — the
    *   escape hatch for short forms that are also legitimate entities). */
  def processDoc(doc: KDoc, excludeAbbrvs: Set[String]): KDoc = {
    if (doc.error.isDefined || doc.sections.isEmpty) return doc
    val sectionToks = doc.sections.map(s => tokTexts(s.text))

    // pass 1: learn (short token seq → source entities of the long span)
    val seenLong = scala.collection.mutable.Set.empty[String]
    val seenShort = scala.collection.mutable.Set.empty[String]
    // short token sequence → entities to copy
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Seq[Mention])]
    doc.sections.zip(sectionToks).foreach { case (section, tt) =>
      val entsByCharKey: Map[(Int, Int), Seq[Mention]] =
        section.entities.filter(_.spans.size == 1)
          .groupBy(e => (e.start, e.end))
      candidates(tt).foreach { case ((ls, le), (ss, se)) =>
        val longToks = (ls until le).map(tt.texts(_))
        val shortToks = (ss until se).map(tt.texts(_))
        findAbbreviation(longToks.toIndexedSeq, shortToks).foreach { startTokOffset =>
          val longText = longToks.drop(startTokOffset).mkString(" ")
          val shortText = shortToks.mkString(" ")
          if (!seenLong(longText) && !seenShort(shortText)) {
            seenLong += longText; seenShort += shortText
            val firstTok = tt.tokens(ls + startTokOffset)
            val lastTok = tt.tokens(le - 1)
            val sourceEnts =
              entsByCharKey.getOrElse((firstTok.start, lastTok.end), Seq.empty)
            rules += ((shortToks, sourceEnts))
          }
        }
      }
    }
    if (rules.isEmpty) return doc

    // pass 2: across all sections, find short-form occurrences, remove
    // entities there, add copies of the long form's entities
    val newSections = doc.sections.zip(sectionToks).map { case (section, tt) =>
      var entities = section.entities
      rules.foreach { case (shortToks, sourceEnts) =>
        var i = 0
        while (i + shortToks.length <= tt.texts.length) {
          val matches = (0 until shortToks.length).forall(k =>
            tt.texts(i + k) == shortToks(k))
          if (matches) {
            val start = tt.tokens(i).start
            val end = tt.tokens(i + shortToks.length - 1).end
            entities = entities.filterNot(e =>
              e.spans.size == 1 && e.start == start && e.end == end &&
                !excludeAbbrvs(e.matchStr))
            val matchStr = section.text.substring(start, end)
            entities = entities ++ sourceEnts.map { src =>
              src.copy(
                matchStr = matchStr,
                spans = Seq(CharSpan(start, end)),
                namespace = Namespace,
                mentionConfidence = MentionConfidence.HighlyLikely,
                matchNorm = Normalizer.normalize(matchStr, src.entityClass))
            }
            i += shortToks.length
          } else i += 1
        }
      }
      section.copy(entities = entities)
    }
    doc.copy(sections = newSections)
  }
}
