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
  * reference; no dependency parser exists in this container, so a
  * comma/coordinator segmentation with a last-word anchor reproduces the
  * reference's behavior on NP coordination (its own four test cases pass
  * bit-for-bit — see entity_splitter_cases.tsv); nested/clausal
  * coordination where the anchor is not the final token is a documented
  * divergence (SURVEY.md C4).
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

  /** Conjunction splitting without a parser: segment the match on commas
    * and coordinators; the LAST segment is the anchor noun phrase (emitted
    * whole, contiguous), its last word is the anchor token, and every
    * earlier segment pairs with the anchor token as a non-contiguous
    * mention — "skin, lung and triple negative breast cancer" →
    * [triple negative breast cancer, skin cancer, lung cancer]. */
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
    val (as, ae) = chunks.last
    val anchorText = m.substring(as, ae)
    // anchor token = last whitespace word of the anchor phrase
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
