package graft.ner

import graft.model._
import graft.text.Normalizer

/** Non-contiguous entity splitting (ref NonContiguousEntitySplitter +
  * SplitOnNumericalListPatternWithPrefix / SplitOnConjunctionPattern,
  * kazu/steps/ner/entity_post_processing.py:29-189).
  *
  * The numerical-list pattern ("BRCA1/2/3" → BRCA1 + BRCA2 + BRCA3) is a
  * pure string rule and is ported EXACTLY, including the reference's
  * trailing-digit scan and span-offset accounting. The conjunction pattern
  * ("skin, lung and breast cancer") uses scispacy noun chunks in the
  * reference; no dependency parser exists in this container, so the rule is
  * re-derived structurally as a dependency-free base-NP approximation:
  *
  *  - conjunct segments = comma/coordinator segmentation — on NP
  *    coordination this IS the spaCy noun_chunks sequence (the reference's
  *    own test cases require "skin, lung and breast cancer" to chunk as
  *    three NPs, not one shared-head NP);
  *  - the anchor token (the reference's `dep_ == "conj"` token inside
  *    `noun_chunks[-1]`) = the HEAD of the final segment's base NP — its
  *    last word, since spaCy base NPs are head-final;
  *  - base-NP discipline: spaCy noun chunks exclude post-head modifiers, so
  *    when the final segment carries a PP / relative clause ("cancer of the
  *    lung"), `noun_chunks[-1]` is the modifier's OBJECT NP ("the lung"),
  *    which contains no conj token → the reference's anchor comes up None
  *    and NOTHING is split. The pre-round-7 last-word heuristic fabricated
  *    "skin lung" here; this rule returns empty, matching the reference
  *    algorithm's anchor-None path.
  *
  * All reference-executed cases in entity_splitter_cases.tsv pass; the
  * residual approximation (earlier conjunct segments are emitted whole,
  * i.e. assumed to be base NPs in the anchor's conjunct set) is exact for
  * flat NP coordination, the shape NER mentions take.
  */
object EntitySplitter {

  /** Which rules run for which entity class (ref entity_conditions,
    * test_entity_post_processing.py:27-32: numerical for gene-like ids,
    * conjunction for disease-like phrases). */
  final case class Config(
      numericalClasses: Set[String] = Set.empty,
      conjunctionClasses: Set[String] = Set.empty
  ) extends Serializable {
    def isEmpty: Boolean = numericalClasses.isEmpty && conjunctionClasses.isEmpty
  }

  object Config {
    /** The reference's DEFAULT entity_conditions (conf/
      * TransformersModelForTokenClassificationNerStep/default.yaml:8-15):
      * numerical + conjunction for gene, conjunction for disease. Classes
      * outside a document's entity set are inert, so this default is safe
      * to wire unconditionally into the pipeline. */
    val default: Config = Config(
      numericalClasses = Set("gene"),
      conjunctionClasses = Set("gene", "disease"))
  }

  private def withSpans(e: Mention, spans: Seq[CharSpan], text: String,
      joinStr: String): Mention = {
    val matchStr = spans.map(s => text.substring(s.start, s.end)).mkString(joinStr)
    e.copy(matchStr = matchStr, spans = spans,
      matchNorm = Normalizer.normalize(matchStr, e.entityClass))
  }

  /** Exact port of SplitOnNumericalListPatternWithPrefix (pattern "/"):
    * "BRCA1/2/3" → [BRCA1 (contiguous), BRCA2, BRCA3 (prefix + digit
    * spans)]; "Monoclonal antibody D8/17" → [.. D8, .. D17]. */
  def splitNumericalList(e: Mention, text: String): Seq[Mention] = {
    val start = e.start
    val parts = e.matchStr.split("/", -1)
    if (parts.length <= 1) return Seq.empty
    val p0 = parts.head
    // the reference's reversed-enumerate: i ends at the index of the first
    // non-digit from the end (= trailing-digit count); exhausting the loop
    // (all digits) leaves i = len-1; empty p0 leaves i unset (None)
    var i = -1
    var k = 0
    var broke = false
    while (k < p0.length && !broke) {
      i = k
      if (!p0.charAt(p0.length - 1 - k).isDigit) broke = true else k += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    out += withSpans(e, Seq(CharSpan(start, start + p0.length)), text, "")
    if (i > 0) {
      val prefix = p0.substring(0, p0.length - i)
      var spanOffset = p0.length + 1
      parts.tail.foreach { part =>
        if (part.nonEmpty && part.forall(_.isDigit)) {
          val spans = Seq(
            CharSpan(start, start + prefix.length),
            CharSpan(start + spanOffset, start + spanOffset + part.length))
          spanOffset += 1 + part.length
          out += withSpans(e, spans, text, "")
        }
        // non-digit parts do not advance the offset — faithful to the
        // reference (entity_post_processing.py:147-165)
      }
    }
    out.toSeq
  }

  private val Coordinators = Seq(" and ", " or ", " nor ")

  /** Prepositions after the head noun open a PP whose OBJECT becomes its
    * own base NP in a spaCy chunking — the final segment's conj head then
    * does not live in `noun_chunks[-1]` and the reference's anchor
    * detection returns None (no split). */
  private val Prepositions = Set(
    "of", "in", "on", "for", "with", "to", "from", "by", "at")

  /** Relative markers open a post-head CLAUSE; its verb is not an NP, so
    * `noun_chunks[-1]` is still the pre-marker base NP — the anchor NP ends
    * at the marker but the split proceeds. */
  private val RelativeMarkers = Set("that", "which", "who")

  /** Conjunction splitting without a parser (see object scaladoc): segment
    * the match on commas and coordinators; the LAST segment is the anchor
    * noun phrase (emitted whole, contiguous), the head of its base NP (its
    * last word, unless a post-head modifier follows — then no split at all)
    * is the anchor token, and every earlier segment pairs with the anchor
    * token as a non-contiguous mention — "skin, lung and triple negative
    * breast cancer" → [triple negative breast cancer, skin cancer,
    * lung cancer]; "skin cancer and cancer of the lung" → [] (anchor NP is
    * the PP object, no conj token → reference anchor-None path). */
  def splitConjunction(e: Mention, text: String): Seq[Mention] = {
    val m = e.matchStr
    if (!Coordinators.exists(m.contains)) return Seq.empty
    // segment with offsets
    val sepRe = ",\\s*| and | or | nor ".r
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    sepRe.findAllMatchIn(m).foreach { g =>
      if (g.start > pos) chunks += ((pos, g.start))
      pos = g.end
    }
    if (pos < m.length) chunks += ((pos, m.length))
    if (chunks.length < 2) return Seq.empty
    val start = e.start
    val (as, segEnd) = chunks.last
    val segText = m.substring(as, segEnd)
    // base-NP discipline over the final segment's words: a PREPOSITION
    // means noun_chunks[-1] is the PP's object (no conj token → reference
    // anchor None → nothing split); a RELATIVE MARKER merely ends the
    // anchor base NP (the clause's verb is not an NP), so the anchor chunk
    // is the pre-marker prefix and the split proceeds
    val segWords = segText.split(' ')
    var npWords = segWords.length
    var i = 0
    while (i < segWords.length) {
      val w = segWords(i).toLowerCase(java.util.Locale.ROOT)
      // a preposition ANYWHERE in the segment (incl. inside a relative
      // clause, "cancer that grows in mice") puts an NP after the anchor —
      // noun_chunks[-1] is that object, anchor None, no split
      if (Prepositions(w)) return Seq.empty
      if (RelativeMarkers(w) && i < npWords) npWords = i
      i += 1
    }
    if (npWords == 0) return Seq.empty // segment STARTS with a marker
    val ae = as + segWords.take(npWords).map(_.length).sum + (npWords - 1)
    val anchorText = m.substring(as, ae)
    // anchor token = head of the final base NP = its last word (base NPs
    // are head-final once post-head modifiers are excluded above)
    val lastSpace = anchorText.lastIndexOf(' ')
    val (ts, te) = (as + lastSpace + 1, ae)
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    out += withSpans(e, Seq(CharSpan(start + as, start + ae)), text, " ")
    chunks.dropRight(1).foreach { case (cs, ce) =>
      out += withSpans(e,
        Seq(CharSpan(start + cs, start + ce), CharSpan(start + ts, start + te)),
        text, " ")
    }
    out.toSeq
  }

  /** Rule dispatch + span-level dedup (ref NonContiguousEntitySplitter:
    * a produced entity is kept only if it introduces at least one span not
    * already seen for this source entity). */
  def split(cfg: Config)(e: Mention, text: String): Seq[Mention] = {
    val rules: Seq[(Mention, String) => Seq[Mention]] =
      (if (cfg.numericalClasses.contains(e.entityClass))
         Seq(splitNumericalList _) else Seq.empty) ++
      (if (cfg.conjunctionClasses.contains(e.entityClass))
         Seq(splitConjunction _) else Seq.empty)
    val existing = scala.collection.mutable.Set.empty[CharSpan]
    existing ++= e.spans
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    rules.foreach { rule =>
      rule(e, text).foreach { found =>
        if (found.spans.exists(!existing.contains(_))) {
          out += found
          existing ++= found.spans
        }
      }
    }
    out.toSeq
  }

  def processDoc(cfg: Config)(doc: KDoc): KDoc =
    if (cfg.isEmpty || doc.error.isDefined) doc
    else doc.copy(sections = doc.sections.map { s =>
      s.copy(entities = s.entities ++ s.entities.flatMap(split(cfg)(_, s.text)))
    })
}
