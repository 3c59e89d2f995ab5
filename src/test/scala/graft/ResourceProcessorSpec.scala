package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ontology._

/** Literal port of the reference's ontology-parser curation scenarios
  * (kazu/tests/test_ontology_parser.py:135-455) over
  * [[Curation.ResourceProcessor]] — the candidate-level apply-curations
  * machinery. Fixtures mirror DummyParser.DEFAULT_DUMMY_DATA
  * (kazu/tests/utils.py:86-107) and the test module's constants.
  */
class ResourceProcessorSpec extends AnyFunSuite {

  private val P1 = "I am the target for actions"
  private val Noop = "noop"
  private val Cls = "action_test"
  private val Target = "hello I'm injected"

  private def dummyRows(parser: String, withTarget: Boolean): Seq[OntologyRow] = {
    val base = Seq(
      ("first", "1", "1", "int"), ("first", "1", "one", "text"),
      ("second", "2", "2", "int"), ("second", "2", "two", "text"),
      ("third", "3", "3", "int"), ("alpha", "4", "4", "int"))
    val rows = if (withTarget) base :+ ((Target, Target, Target, Target)) else base
    rows.map { case (idx, lbl, syn, mt) => OntologyRow(parser, Cls, idx, lbl, syn, mt) }
  }

  private def build(parser: String, withTarget: Boolean): Seq[LinkingCandidate] =
    ResourceBuild.buildCandidates(dummyRows(parser, withTarget))._1

  private def synSpec(text: String) =
    SynonymSpec(text, caseSensitive = false, MentionConfidence.HighlyLikely)

  private def resource(behaviour: String,
      idSets: Option[Set[Set[String]]]): Curation.CurationResource =
    Curation.CurationResource(Set(synSpec(Target)), behaviour,
      associatedIdSets = idSets)

  private def run(withTarget: Boolean, resources: Set[Curation.CurationResource],
      dropIds: Set[String] = Set.empty): Seq[LinkingCandidate] =
    new Curation.ResourceProcessor(P1, Cls, dropIds, resources,
      build(P1, withTarget)).process()._2

  private def noopCount(withTarget: Boolean): Int = build(Noop, withTarget).size

  test("should add resource to parser (explicit existing id)") {
    val out = run(withTarget = false, Set(resource(Behaviour.AddForLinkingOnly,
      Some(Set(Set("first"))))))
    assert(out.size == noopCount(withTarget = false) + 1)
    val added = out.find(_.aggregatedBy == IdAggregation.ModifiedByCuration).get
    assert(added.mappingTypes == Seq("kazu_curated"))
    assert(added.associatedIdSets.flatMap(_.ids.map(_.idx)) == Seq("first"))
  }

  test("should drop from parser via general rule") {
    val out = run(withTarget = true, Set.empty, dropIds = Set("first"))
    // "1" and "one" had only id "first" -> both candidates dropped
    assert(out.size + 2 == noopCount(withTarget = true))
  }

  test("should modify resource from parser via general rule") {
    val res = resource(Behaviour.AddForNerAndLinking,
      Some(Set(Set("first"), Set("second"))))
    val proc = new Curation.ResourceProcessor(P1, Cls, Set("first"), Set(res),
      build(P1, withTarget = false))
    val (kept, out) = proc.process()
    assert(out.size + 1 == noopCount(withTarget = false))
    // no candidate carries the dropped id anywhere
    assert(!out.exists(_.associatedIdSets.exists(_.ids.exists(_.idx == "first"))))
    // the surviving override resource lost the dropped id from its sets
    assert(kept.head.associatedIdSets.contains(Set(Set("second"))))
  }

  test("should not add a resource as id nonexistent") {
    val out = run(withTarget = true, Set(resource(Behaviour.AddForLinkingOnly,
      Some(Set(Set("I do not exist"))))))
    assert(out.size == noopCount(withTarget = true))
    val target = out.find(_.rawSynonyms.contains(Target)).get
    assert(target.associatedIdSets.size == 1)
    assert(!target.associatedIdSets.head.ids.exists(_.idx == "I do not exist"))
  }

  test("should override id set") {
    val out = run(withTarget = true, Set(resource(Behaviour.AddForLinkingOnly,
      Some(Set(Set("second"))))))
    assert(out.size == noopCount(withTarget = true))
    val target = out.find(_.rawSynonyms.contains(Target)).get
    assert(target.associatedIdSets.size == 1)
    val ids = target.associatedIdSets.head.ids.map(_.idx)
    assert(!ids.contains("first") && ids.contains("second"))
    assert(target.aggregatedBy == IdAggregation.ModifiedByCuration)
  }

  test("should not add a resource to db as one already exists") {
    val out = run(withTarget = true, Set(resource(Behaviour.AddForLinkingOnly,
      Some(Set(Set(Target))))))
    assert(out.size == noopCount(withTarget = true))
    // identical explicit set -> no-op: the original candidate survives
    val target = out.find(_.rawSynonyms.contains(Target)).get
    assert(target.aggregatedBy != IdAggregation.ModifiedByCuration)
  }

  test("should not add a resource as can infer associated id sets") {
    val out = run(withTarget = true,
      Set(resource(Behaviour.AddForLinkingOnly, None)))
    assert(out.size == noopCount(withTarget = true))
  }

  test("orphan resource with only unknown ids and no backing candidate is dropped") {
    val proc = new Curation.ResourceProcessor(P1, Cls, Set.empty,
      Set(resource(Behaviour.AddForNerAndLinking, Some(Set(Set("bogus"))))),
      build(P1, withTarget = false))
    val (kept, out) = proc.process()
    // no candidate was created and the resource must not reach the NER
    // surface (it would match with no linking target behind it)
    assert(kept.isEmpty)
    assert(out.size == noopCount(withTarget = false))
  }

  test("conflicting overrides in associated id sets raise") {
    val r1 = resource(Behaviour.AddForLinkingOnly, Some(Set(Set("first"))))
    val r2 = resource(Behaviour.AddForLinkingOnly, Some(Set(Set("second"))))
    intercept[Curation.CurationException] {
      new Curation.ResourceProcessor(P1, Cls, Set.empty, Set(r1, r2),
        build(P1, withTarget = true))
    }
  }
}
