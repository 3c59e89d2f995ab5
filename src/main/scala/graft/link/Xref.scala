package graft.link

import graft.model._

/** Cross-reference expansion (ref CrossReferenceManager / OxoCrossReferenceManager,
  * kazu/steps/linking/post_processing/xref_manager.py:42-216): expand a
  * Mapping into additional mappings in xref'd ontologies via a broadcast
  * xref map. Disabled in the reference default config
  * (conf/MappingStep/default.yaml:6 `cross_ref_managers: ~`) — available
  * here as an optional post-mapping stage.
  */
object Xref {

  /** (source, idx) → targets — keyed by the mapping's SOURCE ontology like
    * the reference's XrefDatabase (xref_manager.py:74-76 keys on
    * `mapping.source`, not the parser), since different parsers can carry
    * sub/supersets of one source's ids. Target carries the parser whose
    * metadata supplies the default label (source_to_parser_metadata_lookup
    * analogue). */
  final case class XrefTarget(parserName: String, source: String, idx: String,
      defaultLabel: String)

  final case class XrefMap(map: Map[(String, String), Seq[XrefTarget]])
      extends Serializable {
    def expand(m: Mapping): Seq[Mapping] =
      map.getOrElse((m.source, m.idx), Seq.empty).map { t =>
        Mapping(
          defaultLabel = t.defaultLabel,
          source = t.source,
          parserName = t.parserName,
          idx = t.idx,
          stringMatchStrategy = "XrefExpansion",
          stringMatchConfidence = m.stringMatchConfidence,
          disambiguationStrategy = m.disambiguationStrategy,
          disambiguationConfidence = m.disambiguationConfidence)
      }
  }

  def processDoc(xrefs: XrefMap)(doc: KDoc): KDoc =
    if (doc.error.isDefined) doc
    else doc.copy(sections = doc.sections.map { s =>
      s.copy(entities = s.entities.map { e =>
        val extra = e.mappings.flatMap(xrefs.expand).distinct
          .filterNot(e.mappings.contains)
        if (extra.isEmpty) e else e.copy(mappings = e.mappings ++ extra)
      })
    })
}
