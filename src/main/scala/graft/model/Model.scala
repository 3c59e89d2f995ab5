package graft.model

/** Core data model for the KG-construction engine.
  *
  * Re-expresses the reference's document/entity/mapping object graph
  * (kazu/data/__init__.py:102-565) as Spark-encodable case classes. Set-valued
  * fields in the reference (frozensets) become canonically-sorted Seqs so that
  * equality / grouping / hashing are deterministic in Spark rows
  * (SURVEY.md §7.4 risk 7).
  */

/** Half-open character interval [start, end). Ref: kazu/data/__init__.py:102-135.
  * The overlap helpers replicate the reference's INCLUSIVE comparisons
  * exactly — is_partially_overlapped counts adjacent spans ([0,5) vs
  * [5,10)) as overlapping, so a strict half-open test here would silently
  * diverge from any ported overlap-resolution logic. */
final case class CharSpan(start: Int, end: Int) {
  def isCompletelyOverlapped(other: CharSpan): Boolean =
    start >= other.start && end <= other.end
  def isPartiallyOverlapped(other: CharSpan): Boolean =
    (other.start <= start && start <= other.end) ||
      (other.start <= end && end <= other.end)
  def length: Int = end - start
}

/** Mention confidence ladder. Ref IntEnum kazu/data/__init__.py:82-86 —
  * kept as Int so ordering (processing is high→low) is a plain numeric sort.
  */
object MentionConfidence {
  val HighlyLikely = 100
  val Probable     = 50
  val Possible     = 10
  val Ignore       = 0
  def name(v: Int): String = v match {
    case 100 => "HIGHLY_LIKELY"
    case 50  => "PROBABLE"
    case 10  => "POSSIBLE"
    case _   => "IGNORE"
  }
  /** Inverse of [[name]] — used when parsing the canonical document JSON
    * back into typed docs (the linking_only HTTP route). */
  def fromName(s: String): Int = s match {
    case "HIGHLY_LIKELY" => HighlyLikely
    case "PROBABLE"      => Probable
    case "POSSIBLE"      => Possible
    case _               => Ignore
  }
}

object StringMatchConfidence {
  val HighlyLikely = "HIGHLY_LIKELY"
  val Probable     = "PROBABLE"
  val Possible     = "POSSIBLE"
}

object DisambiguationConfidence {
  val HighlyLikely = "HIGHLY_LIKELY"
  val Probable     = "PROBABLE"
  val Possible     = "POSSIBLE"
  val Ambiguous    = "AMBIGUOUS"
}

/** A set of (idx, source) pairs that refer to the same concept.
  * Ref: kazu/data/__init__.py:157-171. Canonically sorted for deterministic
  * equality inside Spark rows.
  */
final case class EquivalentIdSet(ids: Seq[IdAndSource]) {
  // UTF-8 byte order, like every other cross-engine tie-break in the repo:
  // default String ordering is UTF-16 code-unit order, which disagrees
  // with binary VARCHAR collation for non-BMP ids
  def canonical: EquivalentIdSet = EquivalentIdSet(
    ids.distinct.sortWith { (a, b) =>
      val c = graft.util.Utf8Order.compare(a.idx, b.idx)
      if (c != 0) c < 0 else graft.util.Utf8Order.less(a.source, b.source)
    })
  def idxs: Seq[String] = ids.map(_.idx)
}

final case class IdAndSource(idx: String, source: String)

/** How an ambiguous synonym's ids were clustered.
  * Ref enum kazu/data/__init__.py:138-147. */
object IdAggregation {
  val NoStrategy           = "NO_STRATEGY"
  val Unambiguous          = "UNAMBIGUOUS"
  val MergedAsNonSymbolic  = "MERGED_AS_NON_SYMBOLIC"
  val ResolvedBySimilarity = "RESOLVED_BY_SIMILARITY"
  val ModifiedByCuration   = "MODIFIED_BY_CURATION"
}

/** One normalized synonym of an ontology: the unit of the broadcast synonym
  * table. Ref: kazu/data/__init__.py:206-237.
  */
final case class LinkingCandidate(
    parserName: String,
    synonymNorm: String,
    rawSynonyms: Seq[String],
    isSymbolic: Boolean,
    mappingTypes: Seq[String],
    associatedIdSets: Seq[EquivalentIdSet],
    aggregatedBy: String
) {
  /** >1 id set ⇔ the synonym genuinely refers to multiple concepts
    * (ref :231-233). */
  def isAmbiguous: Boolean = associatedIdSets.size > 1

  /** Candidate identity per the reference: `aggregated_by` is declared
    * `field(hash=False, compare=False)` (ref :226), so two candidates that
    * differ only in aggregation strategy are the SAME dict key — a
    * re-aggregating step must merge metrics onto the existing entry, not
    * append a twin. The set-typed fields are frozensets in the reference,
    * so they compare order-insensitively here. */
  def sameCandidate(other: LinkingCandidate): Boolean =
    parserName == other.parserName && synonymNorm == other.synonymNorm &&
      isSymbolic == other.isSymbolic &&
      rawSynonyms.toSet == other.rawSynonyms.toSet &&
      mappingTypes.toSet == other.mappingTypes.toSet &&
      // normalize INSIDE each id set too: a construction path that skips
      // .canonical must not split one candidate into two
      associatedIdSets.map(_.ids.toSet).toSet ==
        other.associatedIdSets.map(_.ids.toSet).toSet
}

/** Per (entity, candidate) scores. Ref: kazu/data/__init__.py:240-264. */
final case class LinkingMetrics(
    searchScore: Option[Double] = None,
    embedScore: Option[Double] = None,
    boolScore: Option[Boolean] = None,
    exactMatch: Option[Boolean] = None
)

final case class CandidateWithMetrics(
    candidate: LinkingCandidate,
    metrics: LinkingMetrics
)

/** Final grounded KB link — the object side of an emitted triple.
  * Ref: kazu/data/__init__.py:174-199.
  */
final case class Mapping(
    defaultLabel: String,
    source: String,
    parserName: String,
    idx: String,
    stringMatchStrategy: String,
    stringMatchConfidence: String,
    disambiguationStrategy: Option[String],
    disambiguationConfidence: Option[String]
)

/** A recognized mention. Ref Entity: kazu/data/__init__.py:267-435.
  * Derived fields (start/end/matchNorm) are computed eagerly at construction
  * by the producing stage — rows are immutable.
  */
final case class Mention(
    matchStr: String,
    entityClass: String,
    spans: Seq[CharSpan],             // non-contiguous support; sorted by start
    namespace: String,                // producing stage
    mentionConfidence: Int,
    matchNorm: String,
    candidates: Seq[CandidateWithMetrics] = Seq.empty,
    mappings: Seq[Mapping] = Seq.empty
) {
  def start: Int = if (spans.isEmpty) 0 else spans.map(_.start).min
  def end: Int   = if (spans.isEmpty) 0 else spans.map(_.end).max
  def isContiguous: Boolean = spans.size == 1

  /** Entity-level partial overlap (ref Entity.is_partially_overlapped,
    * kazu/data/__init__.py:341-372): defined ONLY for two single-span
    * entities — non-contiguous entities may overlap "technically" while
    * being semantically distinct ("lung ... cancer" vs "liver cancer"), so
    * any multi-span side is False by contract. The overlap-merge step's
    * non-contiguous bypass is this same rule. */
  def isPartiallyOverlapped(other: Mention): Boolean =
    spans.size == 1 && other.spans.size == 1 &&
      spans.head.isPartiallyOverlapped(other.spans.head)

  /** Candidate accumulation (ref Entity.add_or_update_linking_candidate,
    * kazu/data/__init__.py:299-308): a value-equal candidate (identity per
    * [[LinkingCandidate.sameCandidate]] — `aggregated_by` excluded) MERGES
    * metrics field-wise (defined fields of the new metrics win, absent
    * fields keep the existing value) onto the EXISTING entry — the existing
    * candidate stays the key, as in the reference's dict update; a new
    * candidate appends. This is how successive linking steps (dictionary
    * search score, then embedding score) land on ONE candidate entry. */
  def addOrUpdateCandidate(candidate: LinkingCandidate,
      newMetrics: LinkingMetrics): Mention = {
    val idx = candidates.indexWhere(_.candidate.sameCandidate(candidate))
    if (idx < 0)
      copy(candidates = candidates :+ CandidateWithMetrics(candidate, newMetrics))
    else {
      // Arity-pinned destructuring: adding a field to LinkingMetrics breaks
      // this match at compile time, so the merge can never silently drop it
      // (the reference iterates __dict__ and cannot miss a field).
      val LinkingMetrics(nSearch, nEmbed, nBool, nExact) = newMetrics
      val LinkingMetrics(oSearch, oEmbed, oBool, oExact) = candidates(idx).metrics
      val merged = LinkingMetrics(
        searchScore = nSearch.orElse(oSearch),
        embedScore = nEmbed.orElse(oEmbed),
        boolScore = nBool.orElse(oBool),
        exactMatch = nExact.orElse(oExact))
      copy(candidates = candidates.updated(idx,
        CandidateWithMetrics(candidates(idx).candidate, merged)))
    }
  }
}

/** One section of a document (web pages have a single "body" section).
  * Ref Section: kazu/data/__init__.py:438-488. */
final case class Section(
    name: String,
    text: String,
    entities: Seq[Mention] = Seq.empty,
    sentenceSpans: Seq[CharSpan] = Seq.empty
)

/** The unit of work: one web page as a typed document row.
  * Ref Document: kazu/data/__init__.py:491-565; idx ← url (input_hint).
  * Failures are rows, not task aborts: processing errors land in `error`
  * (ref PROCESSING_EXCEPTION metadata, kazu/data/__init__.py:34).
  */
final case class KDoc(
    url: String,
    warcTs: java.sql.Timestamp,
    text: String,
    lang: String,
    sections: Seq[Section] = Seq.empty,
    error: Option[String] = None
) {
  def entities: Seq[Mention] = sections.flatMap(_.entities)
}

/** Input page row — the north-rule input table shape (BASELINE.json input_hint). */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Output graph edge (FIXTURES.md §5). */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    confidence: String,
    namespace: String,
    matchStr: String,
    start: Int,
    end: Int,
    url: String
)

/** Per-partition lineage row written at every checkpointed stage (north rule). */
final case class LineageRow(
    stage: String,
    partitionId: Int,
    inputSplit: String,
    resourceVersion: String,
    modelVersion: String,
    rowsIn: Long,
    rowsOut: Long,
    failures: Long,
    wallMs: Long,
    runId: String
)

/** Failed-document sink row (ref kazu/pipeline/__init__.py:64-117). */
final case class FailureRow(url: String, stage: String, error: String, runId: String)
