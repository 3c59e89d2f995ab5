package graft.ontology

import graft.model._
import graft.text.Normalizer

/** Ontology-side model: every source ontology is normalized into the long/thin
  * `ontology_raw` shape (ref kazu/ontology_preprocessing/base.py:725-743,
  * FIXTURES.md §2), from which the resource-build job derives the synonym and
  * metadata tables that are broadcast to executors.
  */
final case class OntologyRow(
    parserName: String,
    entityClass: String,
    idx: String,
    defaultLabel: String,
    syn: String,
    mappingType: String
)

final case class MetadataRow(
    parserName: String,
    idx: String,
    defaultLabel: String,
    extras: Map[String, String] = Map.empty
)

/** One NER-active synonym string with its curation attributes
  * (ref Synonym, kazu/data/__init__.py:754-800). */
final case class SynonymSpec(
    text: String,
    caseSensitive: Boolean,
    mentionConfidence: Int
)

/** Curation behaviours (ref OntologyStringBehaviour, kazu/data/__init__.py:675-685). */
object Behaviour {
  val AddForNerAndLinking = "ADD_FOR_NER_AND_LINKING"
  val AddForLinkingOnly   = "ADD_FOR_LINKING_ONLY"
  val DropForLinking      = "DROP_FOR_LINKING"
}

/** Curation unit: all surface forms sharing one syn_norm within a parser
  * (ref OntologyStringResource, kazu/data/__init__.py:754-927). */
final case class StringResource(
    parserName: String,
    entityClass: String,
    synNorm: String,
    synonyms: Seq[SynonymSpec],
    behaviour: String
) {
  def activeNerSynonyms: Seq[SynonymSpec] =
    if (behaviour == Behaviour.AddForNerAndLinking)
      synonyms.filter(_.mentionConfidence != MentionConfidence.Ignore)
    else Seq.empty
}

/** Deterministic string similarity used by the id-grouping step in place of
  * the reference's embedding scorer (base.py:211-309 recommends
  * SapbertStringSimilarityScorer; any symmetric [0,1] scorer is pluggable).
  * We use token-set Jaccard over default-normalized labels: deterministic,
  * dependency-free, and adequate for clustering duplicate KB ids.
  */
object LabelSimilarity {
  def score(a: String, b: String): Double = {
    if (a == b) return 1.0
    val ta = Normalizer.normalize(a, "unknown").split(" ").toSet
    val tb = Normalizer.normalize(b, "unknown").split(" ").toSet
    if (ta.isEmpty || tb.isEmpty) 0.0
    else ta.intersect(tb).size.toDouble / ta.union(tb).size.toDouble
  }
}

object ResourceBuild {

  val SynonymMergeThreshold = 0.70 // ref base.py synonym_merge_threshold

  /** Greedy single-link clustering of a synonym's ids into EquivalentIdSets
    * (rule-for-rule from ref base.py:211-309 `score_and_group_ids`).
    * Iteration order over ids is canonicalized (sorted) for determinism —
    * the reference iterates a Python set.
    */
  def scoreAndGroupIds(
      idsAndSource: Seq[IdAndSource],
      isSymbolic: Boolean,
      defaultLabelOf: String => String
  ): (Seq[EquivalentIdSet], String) = {
    val ids = idsAndSource.distinct.sortBy(i => (i.idx, i.source))
    if (ids.size == 1)
      (Seq(EquivalentIdSet(ids).canonical), IdAggregation.Unambiguous)
    else if (!isSymbolic)
      (Seq(EquivalentIdSet(ids).canonical), IdAggregation.MergedAsNonSymbolic)
    else {
      // greedy: merge id into the best-scoring existing cluster above threshold
      val clusters =
        scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[IdAndSource], scala.collection.mutable.Set[String])]
      ids.foreach { id =>
        val label = defaultLabelOf(id.idx)
        var best: Option[(scala.collection.mutable.ArrayBuffer[IdAndSource], scala.collection.mutable.Set[String])] = None
        var bestScore = 0.0
        clusters.foreach { cl =>
          val sim = cl._2.map(LabelSimilarity.score(label, _)).max
          if (sim > SynonymMergeThreshold && sim > bestScore) {
            best = Some(cl); bestScore = sim
          }
        }
        best match {
          case Some(cl) => cl._1 += id; cl._2 += label
          case None =>
            clusters += ((scala.collection.mutable.ArrayBuffer(id),
              scala.collection.mutable.Set(label)))
        }
      }
      (clusters.map(c => EquivalentIdSet(c._1.toSeq).canonical).toSeq
        .sortBy(_.ids.head.idx),
        IdAggregation.ResolvedBySimilarity)
    }
  }

  /** ontology_raw rows → LinkingCandidates + metadata, entirely as local
    * collections. The ontology side is the *dimension* table of this engine
    * (≤ millions of rows vs 10^12 pages): the build runs once per resource
    * version, is checkpointed, and the result is broadcast. A distributed
    * `groupBy(syn_norm)` variant is trivially expressible but pointless at
    * dimension-table scale — the fact table never shuffles for it.
    */
  def buildCandidates(
      rows: Seq[OntologyRow]
  ): (Seq[LinkingCandidate], Seq[MetadataRow]) = {
    val metadata = rows
      .groupBy(r => (r.parserName, r.idx))
      .map { case ((p, idx), rs) => MetadataRow(p, idx, rs.head.defaultLabel) }
      .toSeq
      .sortBy(m => (m.parserName, m.idx))
    val labelOf: Map[(String, String), String] =
      metadata.map(m => (m.parserName, m.idx) -> m.defaultLabel).toMap

    val candidates = rows
      .groupBy(r => (r.parserName, Normalizer.normalize(r.syn, r.entityClass)))
      .map { case ((parser, synNorm), rs) =>
        val entityClass = rs.head.entityClass
        val synSet = rs.map(_.syn).distinct.sorted
        val isSymbolic =
          synSet.forall(s => Normalizer.classifySymbolic(s, entityClass))
        val ids = rs.map(r => IdAndSource(r.idx, findKb(r.idx))).distinct
        val (idSets, agg) = scoreAndGroupIds(ids, isSymbolic,
          idx => labelOf((parser, idx)))
        LinkingCandidate(
          parserName = parser,
          synonymNorm = synNorm,
          rawSynonyms = synSet,
          isSymbolic = isSymbolic,
          mappingTypes = rs.map(_.mappingType).distinct.sorted,
          associatedIdSets = idSets,
          aggregatedBy = agg
        )
      }
      .toSeq
      .sortBy(c => (c.parserName, c.synonymNorm))
    (candidates, metadata)
  }

  /** Source of an id (ref parsers implement find_kb per ontology;
    * our convention: prefix before ':' else the whole id). */
  def findKb(idx: String): String = {
    if (idx.startsWith("http://") || idx.startsWith("https://")) {
      // OBO-style URI: source = final path fragment's prefix (MONDO_0001 → MONDO)
      val frag = idx.substring(idx.lastIndexOf('/') + 1)
      val u = frag.indexOf('_')
      if (u > 0) frag.substring(0, u) else frag
    } else {
      val i = idx.indexOf(':')
      if (i > 0) idx.substring(0, i) else idx
    }
  }

  /** Default string resources from candidates, applying the reference's
    * autocuration defaults (kazu/ontology_preprocessing/autocuration.py):
    * PROBABLE confidence; symbolic ⇒ case-sensitive
    * (SymbolicToCaseSensitiveAction); len<2 or len>60 ⇒ DROP_FOR_LINKING
    * (MinLength/MaxLength); common corpus words ⇒ POSSIBLE confidence
    * (IsCommonWord). The Chembl-specific all-upper-word →
    * case-insensitive rule (is_upper_case_word_to_case_insensitive) is
    * opt-in via `upperCaseWordsInsensitive`, matching its per-ontology
    * configuration in the reference.
    */
  def defaultResources(
      candidates: Seq[LinkingCandidate],
      entityClassOf: String => String,
      commonWords: Set[String] = Set.empty,
      upperCaseWordsInsensitive: Boolean = false
  ): Seq[StringResource] =
    candidates.map { c =>
      val cls = entityClassOf(c.parserName)
      val allSymbolic = c.rawSynonyms.forall(Normalizer.classifySymbolic(_, cls))
      val allUpperWord = upperCaseWordsInsensitive &&
        c.rawSynonyms.forall(s => s.nonEmpty && s.forall(ch =>
          Character.isLetter(ch) && Character.isUpperCase(ch)))
      val caseSensitive = allSymbolic && !allUpperWord
      val isCommon = c.rawSynonyms.exists(
        _.toLowerCase.split(" ").forall(commonWords.contains))
      val conf =
        if (isCommon) MentionConfidence.Possible else MentionConfidence.Probable
      val behaviour =
        if (c.rawSynonyms.exists(s => s.length < 2 || s.length > 60))
          Behaviour.DropForLinking
        else Behaviour.AddForNerAndLinking
      StringResource(
        parserName = c.parserName,
        entityClass = cls,
        synNorm = c.synonymNorm,
        synonyms = c.rawSynonyms.map(SynonymSpec(_, caseSensitive, conf)),
        behaviour = behaviour
      )
    }
}
