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
              // behaviour tie (no DROP in the group): the more-enabling
              // ADD_FOR_NER_AND_LINKING wins, deterministically — group.head
              // would let the curation FILE ORDER decide whether a synonym
              // is NER-active
              val behaviour =
                if (group.exists(_.behaviour == Behaviour.AddForNerAndLinking))
                  Behaviour.AddForNerAndLinking
                else group.map(_.behaviour).minBy(_.toString)
              group.head.copy(synonyms = syns, behaviour = behaviour)
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

  // --- conflict analyser (ref OntologyStringConflictAnalyser,
  // curation_utils.py:263-636; scenario bar = test_conflict_analyser.py) ----

  object Autofix {
    val Optimistic = "OPTIMISTIC"
    val Pessimistic = "PESSIMISTIC"
    val None = "NONE"
  }

  /** Full-fidelity curation unit (ref OntologyStringResource,
    * kazu/data/__init__.py:754-927): original + generated synonyms,
    * behaviour, optional associated id sets. Identity is structural (case
    * class) like the frozen reference dataclass. */
  final case class CurationResource(
      originalSynonyms: Set[SynonymSpec],
      behaviour: String,
      alternativeSynonyms: Set[SynonymSpec] = Set.empty,
      associatedIdSets: Option[Set[Set[String]]] = None,
      comment: Option[String] = None
  ) {
    def allSynonyms: Set[SynonymSpec] = originalSynonyms ++ alternativeSynonyms
    def activeNerSynonyms: Set[SynonymSpec] =
      if (behaviour == Behaviour.AddForNerAndLinking)
        allSynonyms.filter(_.mentionConfidence != MentionConfidence.Ignore)
      else Set.empty
    /** ref syn_norm_for_linking (data/__init__.py:873-883). */
    def synNormForLinking(entityClass: String): String = {
      val norms = originalSynonyms.map(s =>
        graft.text.Normalizer.normalize(s.text, entityClass))
      require(norms.size == 1,
        s"multiple synonym norms produced by $this: $norms")
      norms.head
    }
  }

  final case class ConflictReport(
      cleanResources: Set[CurationResource],
      mergedResources: Set[CurationResource],
      normalisationConflicts: Set[Set[CurationResource]],
      caseConflicts: Set[Set[CurationResource]]
  )

  final class ConflictAnalyser(entityClass: String, autofix: String = Autofix.None) {

    /** ref verify_resource_set_integrity (curation_utils.py:284-344). */
    def verifyResourceSetIntegrity(input: Set[CurationResource]): ConflictReport = {
      val (merged, eliminated, normConflicts) =
        checkNormalisedBehaviourConflictsAndMerge(input)
      var resources = input -- eliminated ++ merged
      normConflicts.foreach(cs => resources = resources -- cs)
      if (autofix != Autofix.None) {
        val fixedFromNorm = autofixResources(normConflicts)
        val mergedAll = merged ++ fixedFromNorm
        resources ++= fixedFromNorm
        val (caseConflicts, clean) = checkForCaseConflictsAcrossResources(resources)
        ConflictReport(clean ++ autofixResources(caseConflicts), mergedAll,
          Set.empty, Set.empty)
      } else {
        val (caseConflicts, clean) = checkForCaseConflictsAcrossResources(resources)
        ConflictReport(clean, merged, normConflicts, caseConflicts)
      }
    }

    /** ref check_for_normalised_behaviour_conflicts_and_merge_if_possible
      * (curation_utils.py:481-554): same syn_norm + same behaviour + ≤1
      * distinct id set ⇒ merge; otherwise a normalisation conflict. */
    def checkNormalisedBehaviourConflictsAndMerge(
        resources: Set[CurationResource]
    ): (Set[CurationResource], Set[CurationResource], Set[Set[CurationResource]]) = {
      val bySynNorm = resources.groupBy(_.synNormForLinking(entityClass))
      val normConflicts = scala.collection.mutable.Set.empty[Set[CurationResource]]
      val merged = scala.collection.mutable.Set.empty[CurationResource]
      val eliminated = scala.collection.mutable.Set.empty[CurationResource]
      bySynNorm.toSeq.sortBy(_._1).foreach { case (_, group) =>
        if (group.size > 1) {
          val behaviours = group.map(_.behaviour)
          val idSets = group.flatMap(_.associatedIdSets)
          if (behaviours.size > 1 || idSets.size > 1)
            normConflicts += group
          else {
            merged += CurationResource(
              originalSynonyms = group.flatMap(_.originalSynonyms),
              behaviour = behaviours.head,
              alternativeSynonyms = group.flatMap(_.alternativeSynonyms),
              associatedIdSets = idSets.headOption,
              comment = {
                val cs = group.toSeq.flatMap(_.comment)
                if (cs.isEmpty) None else Some(cs.mkString("\n"))
              })
            eliminated ++= group
          }
        }
      }
      (merged.toSet, eliminated.toSet, normConflicts.toSet)
    }

    /** ref autofix_resources (curation_utils.py:345-423): OPTIMISTIC keeps
      * the case-insensitive / highest-confidence reading, PESSIMISTIC the
      * case-sensitive / lowest-confidence one; DROP_FOR_LINKING >
      * ADD_FOR_LINKING_ONLY > ADD_FOR_NER_AND_LINKING. */
    def autofixResources(
        conflicts: Set[Set[CurationResource]]
    ): Set[CurationResource] = {
      val optimistic = autofix == Autofix.Optimistic
      conflicts.flatMap { conflictedSet =>
        val origBySynNorm = scala.collection.mutable.HashMap.empty[String, Set[SynonymSpec]]
        val altBySynNorm = scala.collection.mutable.HashMap.empty[String, Set[SynonymSpec]]
        val confByLower = scala.collection.mutable.HashMap.empty[String, Set[Int]]
        var caseSensitivities = Set.empty[Boolean]
        var idSets = Set.empty[Set[String]]
        var behaviours = Set.empty[String]
        conflictedSet.foreach { r =>
          val sn = r.synNormForLinking(entityClass)
          origBySynNorm(sn) = origBySynNorm.getOrElse(sn, Set.empty) ++ r.originalSynonyms
          altBySynNorm(sn) = altBySynNorm.getOrElse(sn, Set.empty) ++ r.alternativeSynonyms
          behaviours += r.behaviour
          r.allSynonyms.foreach { s =>
            confByLower(s.text.toLowerCase) =
              confByLower.getOrElse(s.text.toLowerCase, Set.empty) + s.mentionConfidence
            caseSensitivities += s.caseSensitive
          }
          r.associatedIdSets.foreach(idSets ++= _)
        }
        val behaviour =
          if (behaviours.contains(Behaviour.DropForLinking)) Behaviour.DropForLinking
          else if (behaviours.contains(Behaviour.AddForLinkingOnly)) Behaviour.AddForLinkingOnly
          else Behaviour.AddForNerAndLinking
        // python min/max over booleans: OPTIMISTIC → ci wins, PESSIMISTIC → cs
        val chosenCs =
          if (optimistic) !caseSensitivities.contains(false)
          else caseSensitivities.contains(true)
        def agg(confs: Set[Int]): Int = if (optimistic) confs.max else confs.min
        def fix(s: SynonymSpec): SynonymSpec =
          s.copy(caseSensitive = chosenCs,
            mentionConfidence = agg(confByLower(s.text.toLowerCase)))
        origBySynNorm.keys.toSeq.sorted.map { sn =>
          CurationResource(
            originalSynonyms = origBySynNorm(sn).map(fix),
            behaviour = behaviour,
            alternativeSynonyms = altBySynNorm.getOrElse(sn, Set.empty).map(fix),
            associatedIdSets = if (idSets.nonEmpty) Some(idSets) else None)
        }
      }
    }

    /** ref check_for_case_conflicts_across_resources + find_case_conflicts
      * (curation_utils.py:425-470): resources sharing any lowercased
      * synonym string are checked together; transitively conflicted
      * resources never count as clean. */
    def checkForCaseConflictsAcrossResources(
        resources: Set[CurationResource],
        strict: Boolean = false
    ): (Set[Set[CurationResource]], Set[CurationResource]) = {
      val byLower = scala.collection.mutable.HashMap.empty[String, Set[CurationResource]]
      resources.foreach(r => r.allSynonyms.foreach { s =>
        byLower(s.text.toLowerCase) =
          byLower.getOrElse(s.text.toLowerCase, Set.empty) + r
      })
      val conflictSubsets = scala.collection.mutable.Set.empty[Set[CurationResource]]
      var allConflicted = Set.empty[CurationResource]
      var clean = Set.empty[CurationResource]
      byLower.values.foreach { group =>
        if (resourceSetHasCaseConflicts(group, strict)) {
          conflictSubsets += group
          allConflicted ++= group
        } else clean ++= group
      }
      (conflictSubsets.toSet, clean -- allConflicted)
    }

    /** ref _resource_set_has_case_conflicts (curation_utils.py:580-636): a
      * case-insensitive synonym must rank strictly below every
      * case-sensitive reading of the same string, and ci readings must
      * agree with each other. */
    def resourceSetHasCaseConflicts(
        resources: Set[CurationResource],
        strict: Boolean = false
    ): Boolean = {
      val cs = scala.collection.mutable.HashMap.empty[String, Set[Int]]
      val ci = scala.collection.mutable.HashMap.empty[String, Set[Int]]
      resources.foreach(_.activeNerSynonyms.foreach { s =>
        if (s.caseSensitive) cs(s.text) = cs.getOrElse(s.text, Set.empty) + s.mentionConfidence
        else ci(s.text.toLowerCase) = ci.getOrElse(s.text.toLowerCase, Set.empty) + s.mentionConfidence
      })
      val csConflict = cs.exists { case (text, csConfs) =>
        val ciConfs = ci.getOrElse(text.toLowerCase, Set.empty)
        ciConfs.size > 1 ||
          (ciConfs.size == 1 && csConfs.nonEmpty &&
            (csConfs.min <= ciConfs.min || strict))
      }
      csConflict || ci.values.exists(_.size > 1)
    }
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
