package graft.ner

import graft.model._
import graft.index.Resources
import graft.text.{Normalizer, Tokenizer}

/** Dictionary NER + exact-match pre-linking over the broadcast gazetteer
  * trie — the default first stage, re-expressing the reference's
  * MemoryEfficientStringMatchingStep scan semantics
  * (kazu/steps/joint_ner_and_linking/memory_efficient_string_matching.py:96-185)
  * as a document-local pure function. No shuffle: the stage is a narrow map.
  */
object TrieNer {

  val Namespace = "TrieNer"

  /** Process one section text: emits ALL boundary-valid gazetteer hits,
    * overlapping included (overlap resolution is MergeOverlaps, later).
    */
  def matchText(res: Resources, text: String): Seq[Mention] = {
    val matchable = text.toLowerCase(java.util.Locale.ROOT)
    val (starts, ends) = Tokenizer.boundaries(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    res.trie.scan(matchable, (endIdx, keyIdx) => {
      val key = res.trie.keys(keyIdx)
      val startIdx = endIdx - key.length + 1
      if (Tokenizer.wordIsValid(startIdx, endIdx, starts, ends)) {
        val matchedText = text.substring(startIdx, endIdx + 1)
        // group payload entries by entity class (sorted ⇒ deterministic)
        val byClass = res.payloads(keyIdx).groupBy(_.entityClass)
        byClass.keys.toSeq.sorted.foreach { cls =>
          val entries = byClass(cls)
          var candidates = List.empty[CandidateWithMetrics]
          var seen = Set.empty[(String, String)]
          // per-parser max confidence (ref :118-149)
          val parserConf = scala.collection.mutable.Map.empty[String, Int]
          entries.foreach { e =>
            val caseOk = !e.caseSensitive || matchedText == e.originalCase
            if (caseOk) {
              e.parserNames.foreach { p =>
                parserConf.updateWith(p)(old =>
                  Some(math.max(old.getOrElse(0), e.mentionConfidence)))
                if (!seen((p, e.synNorm))) {
                  seen += ((p, e.synNorm))
                  res.candidate(p, e.synNorm).foreach { c =>
                    candidates ::= CandidateWithMetrics(c,
                      LinkingMetrics(exactMatch = Some(true)))
                  }
                }
              }
            }
          }
          if (candidates.nonEmpty) {
            val conf = parserConf.values.max
            out += Mention(
              matchStr = matchedText,
              entityClass = cls,
              spans = Seq(CharSpan(startIdx, endIdx + 1)),
              namespace = Namespace,
              mentionConfidence = conf,
              matchNorm = Normalizer.normalize(matchedText, cls),
              candidates = candidates.reverse
                .sortBy(c => (c.candidate.parserName, c.candidate.synonymNorm))
            )
          }
        }
      }
    })
    out.sortBy(m => (m.start, m.end, m.entityClass)).toSeq
  }

  /** Stage: doc → doc with trie mentions appended to each section. */
  def processDoc(res: Resources)(doc: KDoc): KDoc =
    if (doc.error.isDefined) doc
    else doc.copy(sections = doc.sections.map { s =>
      s.copy(
        entities = s.entities ++ matchText(res, s.text),
        sentenceSpans =
          if (s.sentenceSpans.nonEmpty) s.sentenceSpans
          else Tokenizer.sentenceSpans(s.text)
      )
    })
}
