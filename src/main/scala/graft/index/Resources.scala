package graft.index

import graft.model._
import graft.ontology._

/** The per-job resource bundle: everything the reference keeps in its
  * process-global in-memory DBs + pickled automaton
  * (kazu/database/in_memory_db.py:23-149,
  * memory_efficient_string_matching.py:42-94), frozen into one serializable
  * value that the driver builds once and ships as a single Spark broadcast.
  * Executors share it across all tasks — the Spark analogue of the
  * reference's per-Ray-worker model-pack copy, amortized per JVM instead of
  * per worker (SURVEY.md §4).
  */
final case class GazPayload(
    entityClass: String,
    mentionConfidence: Int,
    caseSensitive: Boolean,
    synNorm: String,
    originalCase: String,
    parserNames: Array[String]
) extends Serializable

final class Resources(
    val trie: AhoCorasick,
    /** payloads(i) belongs to trie key i (the lower-cased surface form). */
    val payloads: Array[Array[GazPayload]],
    val synonyms: Map[(String, String), LinkingCandidate], // (parser, synNorm)
    val metadata: Map[(String, String), MetadataRow],      // (parser, idx)
    val entityClassOf: Map[String, String],                // parser → class
    val version: String
) extends Serializable {

  def candidate(parser: String, synNorm: String): Option[LinkingCandidate] =
    synonyms.get((parser, synNorm))

  def defaultLabel(parser: String, idx: String): String =
    metadata.get((parser, idx)).map(_.defaultLabel).getOrElse(idx)
}

object Resources {

  /** Assemble the broadcastable bundle from ontology_raw rows.
    * Mirrors the reference automaton build
    * (memory_efficient_string_matching.py:42-94): key = lower-cased synonym
    * text; payload = per-(class, confidence, caseSensitive, synNorm,
    * originalCase) parser sets, restricted to NER-active synonyms.
    */
  def build(
      rows: Seq[OntologyRow],
      entityClassOf: String => String,
      commonWords: Set[String] = Set.empty,
      version: String = "synthetic-ontology/1"
  ): Resources = {
    val (candidates, metadata) = ResourceBuild.buildCandidates(rows)
    val resources =
      ResourceBuild.defaultResources(candidates, entityClassOf, commonWords)
    assemble(rows.map(_.parserName).distinct.map(p => p -> entityClassOf(p)).toMap,
      candidates, metadata, resources, version)
  }

  /** Assemble from explicit (possibly human-curated) resources — the entry
    * point the curation pipeline and the reference-scenario tests use. */
  def assemble(
      entityClassOf: Map[String, String],
      candidates: Seq[LinkingCandidate],
      metadata: Seq[MetadataRow],
      resources: Seq[StringResource],
      version: String
  ): Resources = {
    // key(lowercased) → (class, conf, cs, synNorm, originalCase) → parser set
    val keyMap = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[(String, Int, Boolean, String, String), scala.collection.mutable.TreeSet[String]]]
    resources.foreach { res =>
      res.activeNerSynonyms.foreach { syn =>
        val inner = keyMap.getOrElseUpdate(
          syn.text.toLowerCase(java.util.Locale.ROOT),
          scala.collection.mutable.LinkedHashMap.empty)
        inner.getOrElseUpdate(
          (res.entityClass, syn.mentionConfidence, syn.caseSensitive,
            res.synNorm, syn.text),
          scala.collection.mutable.TreeSet.empty[String]) += res.parserName
      }
    }
    require(keyMap.nonEmpty, "no NER-active synonyms in ontology")
    val keys = keyMap.keys.toArray.sorted
    val payloads: Array[Array[GazPayload]] = keys.map { k =>
      keyMap(k).toArray
        .sortBy { case ((cls, conf, cs, sn, oc), _) => (cls, -conf, cs, sn, oc) }
        .map { case ((cls, conf, cs, sn, oc), parsers) =>
          GazPayload(cls, conf, cs, sn, oc, parsers.toArray)
        }
    }
    new Resources(
      AhoCorasick.build(keys),
      payloads,
      candidates.map(c => (c.parserName, c.synonymNorm) -> c).toMap,
      metadata.map(m => (m.parserName, m.idx) -> m).toMap,
      entityClassOf,
      version
    )
  }

  /** The corpus-vocabulary bundle used for tests/bench over the driver's
    * `documents` table. */
  lazy val corpus: Resources =
    build(CorpusOntology.rows, CorpusOntology.entityClassOf,
      CorpusOntology.CommonWords)
}
