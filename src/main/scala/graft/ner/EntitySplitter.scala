package graft.ner

import graft.model._
import graft.text.Normalizer

/** Non-contiguous entity splitting (ref NonContiguousEntitySplitter +
  * SplitOnNumericalListPatternWithPrefix / SplitOnConjunctionPattern,
  * kazu/steps/ner/entity_post_processing.py:29-189).
  *
  * The numerical-list pattern ("HER2/3" → HER2 + HER3) is a pure string
  * rule and is ported directly. The conjunction pattern ("lung and liver
  * cancer") needs noun-chunking in the reference (scispacy); here a
  * dependency-free heuristic handles the two-conjunct "X and Y Z" shape the
  * reference's tests exercise, and is documented as a recall approximation
  * (SURVEY.md C4).
  */
object EntitySplitter {

  /** "HER2/3" → spans for HER2 (contiguous) and HER3 (non-contiguous:
    * prefix chars + the digit after '/'). */
  def splitNumericalList(e: Mention, text: String): Seq[Mention] = {
    if (!e.isContiguous) return Seq.empty
    val m = e.matchStr
    val pat = "^([A-Za-z]+[0-9]+)(/([0-9]+))+$".r
    pat.findFirstMatchIn(m) match {
      case None => Seq.empty
      case Some(_) =>
        val base = "^[A-Za-z]+".r.findFirstIn(m).get
        val numbers = "[0-9]+".r.findAllMatchIn(m).toSeq
        if (numbers.size < 2) return Seq.empty
        val start = e.start
        numbers.drop(1).map { num =>
          val prefixSpan = CharSpan(start, start + base.length)
          val numSpan = CharSpan(start + num.start, start + num.end)
          val matchStr = base + num.group(0)
          Mention(
            matchStr = matchStr,
            entityClass = e.entityClass,
            spans = Seq(prefixSpan, numSpan),
            namespace = e.namespace,
            mentionConfidence = e.mentionConfidence,
            matchNorm = Normalizer.normalize(matchStr, e.entityClass))
        }
    }
  }

  /** "lung and liver cancer" → "lung cancer" (non-contiguous) +
    * "liver cancer" (contiguous suffix). Two-conjunct heuristic. */
  def splitConjunction(e: Mention, text: String): Seq[Mention] = {
    if (!e.isContiguous) return Seq.empty
    val m = e.matchStr
    val pat = "^(\\S+) (and|or) (\\S+) (\\S+)$".r
    pat.findFirstMatchIn(m) match {
      case None => Seq.empty
      case Some(g) =>
        val start = e.start
        val head = g.group(1); val noun = g.group(4)
        val headSpan = CharSpan(start, start + head.length)
        val nounStart = start + m.length - noun.length
        val nounSpan = CharSpan(nounStart, start + m.length)
        val matchStr = s"$head $noun"
        Seq(Mention(
          matchStr = matchStr,
          entityClass = e.entityClass,
          spans = Seq(headSpan, nounSpan),
          namespace = e.namespace,
          mentionConfidence = e.mentionConfidence,
          matchNorm = Normalizer.normalize(matchStr, e.entityClass)))
    }
  }

  def split(e: Mention, text: String): Seq[Mention] =
    splitNumericalList(e, text) ++ splitConjunction(e, text)

  def processDoc(doc: KDoc): KDoc =
    if (doc.error.isDefined) doc
    else doc.copy(sections = doc.sections.map { s =>
      s.copy(entities = s.entities ++ s.entities.flatMap(split(_, s.text)))
    })
}
