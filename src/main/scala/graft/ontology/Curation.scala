package graft.ontology

import graft.model.MentionConfidence

/** Curation application + conflict analysis (ref GlobalParserActions /
  * ParserAction, kazu/data/__init__.py:687-751, and the conflict analyser in
  * kazu/ontology_preprocessing/curation_utils.py:1-1165).
  */
object Curation {

  /** Global drop-ids override (ref ParserBehaviour.DROP_IDS_FROM_PARSER):
    * relationally an anti-join of ontology_raw against the drop list. */
  def applyGlobalActions(
      rows: Seq[OntologyRow],
      dropIds: Map[String, Set[String]]
  ): Seq[OntologyRow] =
    rows.filterNot(r => dropIds.getOrElse(r.parserName, Set.empty).contains(r.idx))

  final case class Conflict(parserName: String, synNorm: String, reason: String)

  /** Merge human curation overrides into default resources, keyed by
    * (parser, synNorm); report conflicts. Deterministic resolution rules
    * (mirroring the reference conflict analyser's documented outcomes,
    * curation_utils.py:590-610):
    *  - an explicit override replaces the default resource outright;
    *  - duplicate overrides for one key: DROP_FOR_LINKING wins over
    *    ADD_*; else case-insensitive wins over case-sensitive (a ci entry
    *    subsumes cs); else the higher mention confidence wins.
    */
  def applyCurations(
      defaults: Seq[StringResource],
      overrides: Seq[StringResource]
  ): (Seq[StringResource], Seq[Conflict]) = {
    val conflicts = scala.collection.mutable.ArrayBuffer.empty[Conflict]
    val merged = overrides
      .groupBy(r => (r.parserName, r.synNorm))
      .map { case ((p, sn), group) =>
        val resolved =
          if (group.size == 1) group.head
          else {
            conflicts += Conflict(p, sn, s"${group.size} curation entries")
            val drop = group.find(_.behaviour == Behaviour.DropForLinking)
            drop.getOrElse {
              val syns = group.flatMap(_.synonyms)
                .groupBy(_.text)
                .map { case (_, ss) =>
                  ss.reduce { (a, b) =>
                    SynonymSpec(a.text,
                      caseSensitive = a.caseSensitive && b.caseSensitive,
                      mentionConfidence =
                        math.max(a.mentionConfidence, b.mentionConfidence))
                  }
                }
                .toSeq.sortBy(_.text)
              group.head.copy(synonyms = syns)
            }
          }
        (p, sn) -> resolved
      }
    val out = defaults.map { d =>
      merged.getOrElse((d.parserName, d.synNorm), d)
    } ++ merged.collect {
      case (k, r) if !defaults.exists(d => (d.parserName, d.synNorm) == k) => r
    }
    (out.sortBy(r => (r.parserName, r.synNorm)), conflicts.toSeq)
  }

  /** Sanity lint used by tests: NER-active synonyms must be non-empty
    * strings with IGNORE entries filtered (ref acceptance consistency
    * checks, acceptance_test.py:284-306). */
  def lint(resources: Seq[StringResource]): Seq[Conflict] =
    resources.flatMap { r =>
      val bad = r.activeNerSynonyms.filter(s =>
        s.text.isEmpty || s.mentionConfidence == MentionConfidence.Ignore)
      if (bad.nonEmpty)
        Seq(Conflict(r.parserName, r.synNorm, s"${bad.size} invalid NER synonyms"))
      else Seq.empty
    }
}
