package graft.post

import graft.model._

/** Overlap/nesting resolution (ref MergeOverlappingEntsStep,
  * kazu/steps/other/merge_overlapping_ents.py:10-140): document-local
  * sweep-line — sort contiguous entities by start, grow maximal overlap
  * "locations", keep one winner per location.
  */
object MergeOverlaps {

  /** Class priority, first = highest (ref conf/MergeOverlappingEntsStep/
    * default.yaml lists disease..cellular_component; our corpus classes are
    * appended for the synthetic ontology). */
  val DefaultPreferredOrder: Seq[String] = Seq(
    "disease", "drug", "gene", "anatomy", "cell_line", "cell_type",
    "biological_process", "molecular_function", "cellular_component",
    "operator", "component"
  )

  final case class Config(preferredOrder: Seq[String] = DefaultPreferredOrder,
      ignoreNonContiguous: Boolean = true) extends Serializable {
    // first = higher priority ⇒ larger rank (ref reversed-enumerate)
    val rank: Map[String, Int] =
      preferredOrder.reverse.zipWithIndex.toMap
  }

  /** Winner sort key (ref :54-70): mappings > span length > class priority >
    * mention confidence > class name, all descending. */
  private def winner(cfg: Config, ents: Seq[Mention]): Mention =
    ents.sortBy { e =>
      (!e.mappings.nonEmpty, // false (has mappings) sorts first
        -(e.end - e.start),
        -cfg.rank.getOrElse(e.entityClass, 0),
        -e.mentionConfidence,
        e.entityClass) // reverse-alphabetical => invert below
    }(Ordering.Tuple5(Ordering.Boolean, Ordering.Int, Ordering.Int,
      Ordering.Int, Ordering.String.reverse)).head

  def processSection(cfg: Config, s: Section): Section = {
    if (s.entities.isEmpty) return s
    val (contig, nonContig) =
      if (cfg.ignoreNonContiguous) s.entities.partition(_.isContiguous)
      else (s.entities, Seq.empty[Mention])
    if (contig.isEmpty) return s
    val sorted = contig.sortBy(e => (e.start, e.end))
    val kept = scala.collection.mutable.ArrayBuffer.empty[Mention]
    var group = scala.collection.mutable.ArrayBuffer(sorted.head)
    var start = sorted.head.start
    var end = sorted.head.end
    sorted.tail.foreach { e =>
      if (start <= e.start && e.start < end) {
        if (e.end > end) end = e.end
        group += e
      } else {
        kept += (if (group.size > 1) winner(cfg, group.toSeq) else group.head)
        group = scala.collection.mutable.ArrayBuffer(e)
        start = e.start; end = e.end
      }
    }
    kept += (if (group.size > 1) winner(cfg, group.toSeq) else group.head)
    s.copy(entities = kept.toSeq ++ nonContig)
  }

  def processDoc(cfg: Config)(doc: KDoc): KDoc =
    if (doc.error.isDefined) doc
    else doc.copy(sections = doc.sections.map(processSection(cfg, _)))
}

/** Final cleanup filters (ref CleanupStep + default actions,
  * kazu/steps/other/cleanup.py:26-223, conf/CleanupActions/default.yaml):
  * drop AMBIGUOUS-disambiguation mappings, then drop unmapped entities below
  * PROBABLE mention confidence; optional URI stripping.
  */
object Cleanup {

  final case class Config(
      dropDisambiguationConfidences: Set[String] = Set(DisambiguationConfidence.Ambiguous),
      dropStringMatchConfidences: Set[String] = Set.empty,
      minUnmappedConfidence: Int = MentionConfidence.Probable,
      stripUris: Boolean = true,
      clearCandidates: Boolean = true
  ) extends Serializable

  /** Ref StripMappingURIsAction._strip_uri (cleanup.py:139-157): urlparse,
    * then the PATH's last '/'-segment — the query and fragment are dropped
    * first, exactly as urlparse separates them (".../onto.owl#GO_0005634"
    * → "onto.owl", ".../a?q=1" → "a", authority-only → ""). Deliberate
    * deviation, documented: the reference's scheme test on modern Python
    * treats a CURIE prefix as a scheme ("MONDO:0004979" → scheme "mondo",
    * stripped to "0004979"), contradicting its own docstring's intent; we
    * require "://" so CURIE ids pass through unchanged. */
  def stripUri(idx: String): String = {
    val scheme = idx.indexOf("://")
    if (scheme < 0) idx
    else {
      val afterScheme = idx.substring(scheme + 3)
      val path0 = afterScheme.takeWhile(_ != '#').takeWhile(_ != '?')
      val slash = path0.indexOf('/')
      if (slash < 0) "" // authority only: urlparse path is empty
      else path0.substring(path0.lastIndexOf('/') + 1)
    }
  }

  def processDoc(cfg: Config)(doc: KDoc): KDoc = {
    if (doc.error.isDefined) return doc
    doc.copy(sections = doc.sections.map { s =>
      val ents = s.entities
        .map { e =>
          val mappings = e.mappings
            .filterNot(m =>
              m.disambiguationConfidence.exists(cfg.dropDisambiguationConfidences) ||
                cfg.dropStringMatchConfidences(m.stringMatchConfidence))
            .map(m => if (cfg.stripUris) m.copy(idx = stripUri(m.idx)) else m)
          e.copy(
            mappings = mappings,
            candidates = if (cfg.clearCandidates) Seq.empty else e.candidates)
        }
        .filterNot(e =>
          e.mappings.isEmpty && e.mentionConfidence < cfg.minUnmappedConfidence)
      s.copy(entities = ents)
    })
  }
}
