package graft.ontology

import graft.model.{EquivalentIdSet, IdAggregation, IdAndSource, LinkingCandidate, MentionConfidence}

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

  // --- candidate-level resource processor ----------------------------------

  /** Raised for unfixable human-curation conflicts (ref CurationError,
    * curation_utils.py:36; raise site base.py:415 when the human set has
    * normalisation conflicts — e.g. two overrides with different explicit
    * id sets for one syn_norm). */
  final class CurationException(msg: String) extends RuntimeException(msg)

  /** Applies global actions and curated resources to a parser's built
    * candidate set — the reference's OntologyResourceProcessor
    * (curation_utils.py:710-1165; scenario bar = test_ontology_parser.py).
    *
    * Semantics, rule for rule:
    *  - global DROP_IDS_FROM_PARSER removes the id from every candidate
    *    (empty id sets ⇒ the candidate is dropped; a modified candidate is
    *    re-aggregated as MODIFIED_BY_CURATION) and from every override
    *    resource's explicit id sets (empty ⇒ the resource is removed);
    *  - resources apply in behaviour order ADD_FOR_NER_AND_LINKING →
    *    ADD_FOR_LINKING_ONLY → DROP_FOR_LINKING, explicit-id-set overrides
    *    after plain adds;
    *  - an ADD with no explicit id sets inherits an existing candidate
    *    (no action) and is dropped when the syn_norm is unknown (nothing to
    *    infer, ref :1090-1098);
    *  - an ADD with explicit id sets referencing unknown ids has those ids
    *    ignored (ref :1139-1147); whatever remains overrides/creates the
    *    candidate as MODIFIED_BY_CURATION with mapping type "kazu_curated";
    *    an explicit set identical to the existing candidate's is a no-op.
    *
    * The human-curation conflict gate (two resources whose explicit id sets
    * disagree for one syn_norm) throws [[CurationException]] — the
    * reference raises CurationError from the conflict analyser before the
    * processor ever runs (base.py:395-423). */
  final class ResourceProcessor(
      parserName: String,
      entityClass: String,
      globalDropIds: Set[String],
      resources: Set[CurationResource],
      candidates: Seq[LinkingCandidate]
  ) {
    import scala.collection.mutable

    private val behaviourOrder = Map(
      Behaviour.AddForNerAndLinking -> 0,
      Behaviour.AddForLinkingOnly -> 1,
      Behaviour.DropForLinking -> 2)

    private val bySynNorm = mutable.LinkedHashMap.empty[String, LinkingCandidate]
    candidates.foreach(c => bySynNorm(c.synonymNorm) = c)
    // id → source, harvested from the parser's own candidates (explicit
    // resource id sets carry bare ids; sources resolve against the parser)
    private val sourceOf: Map[String, String] = candidates
      .flatMap(_.associatedIdSets.flatMap(_.ids).map(i => i.idx -> i.source))
      .toMap
    private var liveResources = resources

    // conflict gate (ref base.py:415): same syn_norm, >1 distinct explicit
    // id set, or >1 behaviour ⇒ unfixable human conflict
    resources.groupBy(_.synNormForLinking(entityClass)).foreach {
      case (sn, group) =>
        val explicit = group.flatMap(_.associatedIdSets)
        if (explicit.size > 1 || group.map(_.behaviour).size > 1)
          throw new CurationException(
            s"$parserName: conflicting curations for syn_norm '$sn'")
    }

    private def idxSets(c: LinkingCandidate): Set[Set[String]] =
      c.associatedIdSets.map(_.ids.map(_.idx).toSet).toSet

    private def dropIdFromSets(id: String,
        sets: Set[Set[String]]): Set[Set[String]] =
      sets.map(_ - id).filter(_.nonEmpty)

    private def toEquivSets(sets: Set[Set[String]]): Seq[EquivalentIdSet] =
      sets.toSeq
        .map(s => EquivalentIdSet(
          s.toSeq.sorted.map(i =>
            IdAndSource(i, sourceOf.getOrElse(i, parserName)))).canonical)
        .sortBy(_.ids.head.idx)

    private def processGlobalActions(): Unit =
      globalDropIds.toSeq.sorted.foreach { id =>
        bySynNorm.toSeq.filter(_._2.associatedIdSets.exists(_.ids.exists(_.idx == id)))
          .foreach { case (sn, cand) =>
            val remaining = dropIdFromSets(id, idxSets(cand))
            if (remaining.isEmpty) bySynNorm.remove(sn)
            else bySynNorm(sn) = cand.copy(
              associatedIdSets = toEquivSets(remaining),
              aggregatedBy = IdAggregation.ModifiedByCuration)
          }
        liveResources = liveResources.flatMap { r =>
          r.associatedIdSets match {
            case Some(sets) if sets.exists(_.contains(id)) =>
              val remaining = dropIdFromSets(id, sets)
              if (remaining.isEmpty) None
              else Some(r.copy(associatedIdSets = Some(remaining)))
            case _ => Some(r)
          }
        }
      }

    private def attemptAdd(r: CurationResource): Option[CurationResource] = {
      val synNorm = r.synNormForLinking(entityClass)
      val existing = bySynNorm.get(synNorm)
      r.associatedIdSets match {
        case None =>
          // inherit parser defaults when present; nothing to infer otherwise
          if (existing.isDefined) Some(r) else None
        case Some(sets) if sets.isEmpty => None
        case Some(sets) =>
          if (existing.exists(c => idxSets(c) == sets)) Some(r)
          else {
            val validated = sets
              .map(_.filter(sourceOf.contains)).filter(_.nonEmpty)
            // every explicit id unknown AND nothing in the db to back the
            // synonym: keeping it would put a string on the NER surface
            // with no linking target (deviation from the reference, which
            // keeps the orphan resource — consistent with the None branch)
            if (validated.isEmpty && existing.isEmpty) return None
            if (validated.nonEmpty) {
              val isSymbolic = r.originalSynonyms.exists(s =>
                graft.text.Normalizer.classifySymbolic(s.text, entityClass))
              bySynNorm(synNorm) = LinkingCandidate(
                parserName = parserName,
                synonymNorm = synNorm,
                rawSynonyms = r.originalSynonyms.map(_.text).toSeq.sorted,
                isSymbolic = isSymbolic,
                mappingTypes = Seq("kazu_curated"),
                associatedIdSets = toEquivSets(validated),
                aggregatedBy = IdAggregation.ModifiedByCuration)
            }
            Some(r)
          }
      }
    }

    /** Run the processor: returns the surviving resources (NER surface) and
      * the final candidate set (linking surface), both deterministically
      * ordered. */
    def process(): (Seq[CurationResource], Seq[LinkingCandidate]) = {
      processGlobalActions()
      val ordered = liveResources.toSeq.sortBy(r => (
        behaviourOrder.getOrElse(r.behaviour, Int.MaxValue),
        r.associatedIdSets.isDefined,
        r.synNormForLinking(entityClass)))
      val kept = ordered.flatMap { r =>
        if (r.behaviour == Behaviour.DropForLinking) {
          bySynNorm.remove(r.synNormForLinking(entityClass))
          None
        } else attemptAdd(r)
      }
      (kept, bySynNorm.values.toSeq.sortBy(_.synonymNorm))
    }
  }
}
