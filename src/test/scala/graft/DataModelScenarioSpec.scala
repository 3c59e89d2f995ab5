package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._

/** Port of the reference's data-model contract tests
  * (kazu/tests/test_data.py:34-103): entity-level partial overlap (defined
  * only for single-span × single-span) and candidate accumulation (merge
  * metrics for a value-equal candidate, differentiate on parser or id set).
  */
class DataModelScenarioSpec extends AnyFunSuite {

  private def ent(spans: CharSpan*): Mention =
    Mention("m", "test", spans.toSeq, "test", 50, "M")

  test("overlap logic: single-span overlap True; non-contiguous False") {
    // "the patient has metastatic liver cancers"
    val e1 = ent(CharSpan(16, 39)) // metastatic liver cancer
    val e2 = ent(CharSpan(27, 40)) // liver cancers
    assert(e1.isPartiallyOverlapped(e2))
    assert(e2.isPartiallyOverlapped(e1))

    // "lung and liver cancer": non-contiguous lung cancer vs liver cancer
    val lung = ent(CharSpan(0, 4), CharSpan(15, 21))
    val liver = ent(CharSpan(9, 21))
    assert(!lung.isPartiallyOverlapped(liver))
    assert(!liver.isPartiallyOverlapped(lung))
  }

  private def dummyCandidate(ids: Seq[String], parser: String): LinkingCandidate =
    LinkingCandidate(parser, "1", Seq("1", "one"), isSymbolic = false,
      mappingTypes = Seq.empty,
      associatedIdSets = Seq(EquivalentIdSet(ids.map(IdAndSource(_, "test"))).canonical),
      aggregatedBy = "NO_STRATEGY")

  test("candidate manipulation: merge metrics on value-equal candidates, " +
    "differentiate on parser name or id set") {
    val e0 = ent(CharSpan(16, 39))
    // same (ids, parser) candidate added twice with different metric fields
    val e1 = e0
      .addOrUpdateCandidate(dummyCandidate(Seq("1", "2", "3"), "test"),
        LinkingMetrics(searchScore = Some(99.5)))
      .addOrUpdateCandidate(dummyCandidate(Seq("1", "2", "3"), "test"),
        LinkingMetrics(embedScore = Some(99.6)))
    assert(e1.candidates.size == 1)
    val merged = e1.candidates.head.metrics
    assert(merged.searchScore.contains(99.5) && merged.embedScore.contains(99.6))

    // different parser name → separate candidate
    val e2 = e1.addOrUpdateCandidate(dummyCandidate(Seq("1", "2", "3"), "test_2"),
      LinkingMetrics(searchScore = Some(99.5)))
    assert(e2.candidates.size == 2)

    // different id set → separate candidate
    val e3 = e2.addOrUpdateCandidate(dummyCandidate(Seq("1", "2"), "test"),
      LinkingMetrics(searchScore = Some(99.5)))
    assert(e3.candidates.size == 3)
  }

  test("candidate identity excludes aggregated_by and is set-based on " +
    "frozenset fields (ref LinkingCandidate compare=False on aggregated_by)") {
    val e0 = ent(CharSpan(16, 39))
    val base = dummyCandidate(Seq("1", "2", "3"), "test")
    val e1 = e0.addOrUpdateCandidate(base, LinkingMetrics(searchScore = Some(1.0)))
    // same candidate re-aggregated by a later step, raw synonyms reordered:
    // must MERGE onto the existing entry, keeping its aggregatedBy (the
    // reference dict keeps the original key on update)
    val reAgg = base.copy(aggregatedBy = "UNAMBIGUOUS",
      rawSynonyms = base.rawSynonyms.reverse)
    val e2 = e1.addOrUpdateCandidate(reAgg, LinkingMetrics(embedScore = Some(2.0)))
    assert(e2.candidates.size == 1)
    assert(e2.candidates.head.candidate.aggregatedBy == "NO_STRATEGY")
    val m = e2.candidates.head.metrics
    assert(m.searchScore.contains(1.0) && m.embedScore.contains(2.0))
  }
}
