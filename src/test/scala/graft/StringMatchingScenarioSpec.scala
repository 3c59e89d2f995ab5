package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ontology._
import graft.index.Resources
import graft.ner.TrieNer

/** Literal port of the reference's shared string-matching scenarios
  * (kazu/tests/string_matching_utils.py:42-266 plus the two extra cases in
  * test_memory_efficient_string_matching.py:43-129), run end-to-end over
  * the same machinery the product uses: parser data → candidate build →
  * curated-resource processor → gazetteer assembly → TrieNer scan. The
  * parsers are "ignore-all by default": ONLY curated resources are
  * NER-active, as in the reference fixtures.
  */
class StringMatchingScenarioSpec extends AnyFunSuite {

  private val P1 = "first_mock_parser"
  private val P2 = "second_mock_parser"
  private val T1 = "ent_type_1"
  private val T2 = "ent_type_2"
  private val TargetIdx = "http://my.fake.ontology/complex_disease_123"
  private val Complex7Norm = "COMPLEX 7 DISEASE ALPHA"
  private val Hl = MentionConfidence.HighlyLikely

  private val ExampleText =
    "There is a Q42_ID and Q42_syn in this sentence, as well as Q42_syn & Q8_syn synonyms.\n" +
    "    This sentence is just to test when there are multiple synonyms for a single LinkingCandidate,\n" +
    "    like for complex 7 disease alpha a.k.a ComplexVII Diseaseα amongst others."

  private def rows(parser: String, cls: String,
      data: Seq[(String, String, String)]): Seq[OntologyRow] =
    data.map { case (idx, lbl, syn) => OntologyRow(parser, cls, idx, lbl, syn, "test") }

  private val parser1Data = Seq(
    ("http://my.fake.ontology/entity_id_123", "LinkingCandidate", "LinkingCandidate"),
    (TargetIdx, "LinkingCandidate", "LinkingCandidate"),
    (TargetIdx, "Complex Disease Alpha VII", "complexVII diseaseα"),
    ("http://my.fake.ontology_amongst_id_123", "Amongst", "amongst"),
    ("http://my.fake.ontology_amongst_id_124", "Amongst Us", "amongst us"))

  private val parser2Data = Seq(
    ("http://my.fake.ontology/entity_id_123", "LinkingCandidate", "LinkingCandidate"),
    ("http://my.fake.ontology/entity_id_456", "LinkingCandidate", "LinkingCandidate"),
    (TargetIdx, "Complex Disease Alpha VII", "complexVII diseaseα"),
    ("http://my.fake.ontology_amongst_id_123", "Amongst", "amongst"))

  private def curated(text: String, cs: Boolean = false, conf: Int = Hl,
      behaviour: String = Behaviour.AddForNerAndLinking): Curation.CurationResource =
    Curation.CurationResource(Set(SynonymSpec(text, cs, conf)), behaviour,
      associatedIdSets = Some(Set(Set(TargetIdx))))

  /** The reference harness: per parser, candidates built from the data and
    * curations applied; the NER surface is curated resources ONLY. */
  private def assemble(p1Res: Seq[Curation.CurationResource],
      p2Res: Seq[Curation.CurationResource], p2Type: String): Resources = {
    val classOf = Map(P1 -> T1, P2 -> p2Type)
    val perParser = Seq(
      (P1, T1, parser1Data, p1Res), (P2, p2Type, parser2Data, p2Res))
    val built = perParser.map { case (p, cls, data, res) =>
      val (cands, meta) = ResourceBuild.buildCandidates(rows(p, cls, data))
      val (kept, finalCands) =
        new Curation.ResourceProcessor(p, cls, Set.empty, res.toSet, cands).process()
      val strRes = kept.map(r => StringResource(p, cls,
        r.synNormForLinking(cls), r.allSynonyms.toSeq.sortBy(_.text), r.behaviour))
      (finalCands, meta, strRes)
    }
    Resources.assemble(classOf, built.flatMap(_._1), built.flatMap(_._2),
      built.flatMap(_._3), "string-matching-scenarios/1")
  }

  /** match_ontology_data: (entity_class, parser, syn_norm, confidence). */
  private def tuples(ms: Seq[Mention]): Set[(String, String, String, Int)] =
    ms.flatMap(m => m.candidates.map(c =>
      (m.entityClass, c.candidate.parserName, c.candidate.synonymNorm,
        m.mentionConfidence))).toSet

  private def scan(res: Resources): Seq[Mention] =
    TrieNer.matchText(res, ExampleText)

  test("two case-insensitive resources from two parsers: both hit") {
    val ms = scan(assemble(Seq(curated("complexVII diseaseα")),
      Seq(curated("complexVII diseaseα")), T2))
    assert(ms.size == 2)
    assert(ms.map(_.matchStr).toSet == Set("ComplexVII Diseaseα"))
    assert(tuples(ms) == Set(
      (T1, P1, Complex7Norm, Hl), (T2, P2, Complex7Norm, Hl)))
  }

  test("case sensitivity: only the case-insensitive resource hits") {
    val ms = scan(assemble(Seq(curated("complexVII diseaseα")),
      Seq(curated("complexVII diseaseα", cs = true)), T2))
    assert(ms.size == 1)
    assert(tuples(ms) == Set((T1, P1, Complex7Norm, Hl)))
  }

  test("ADD_FOR_LINKING_ONLY resources are not NER-active") {
    val ms = scan(assemble(Seq(curated("complexVII diseaseα")),
      Seq(curated("complexVII diseaseα",
        behaviour = Behaviour.AddForLinkingOnly)), T2))
    assert(ms.size == 1)
    assert(tuples(ms) == Set((T1, P1, Complex7Norm, Hl)))
  }

  test("novel curated synonym is added to the synonym DB and hits") {
    val ms = scan(assemble(Seq(curated("This sentence is just to test")),
      Seq.empty, T2))
    assert(ms.size == 1)
    assert(ms.head.matchStr == "This sentence is just to test")
    assert(tuples(ms) == Set((T1, P1, "THIS SENTENCE IS JUST TO TEST", Hl)))
  }

  test("same string and entity class from two parsers: higher confidence wins") {
    val ms = scan(assemble(
      Seq(curated("complexVII diseaseα", conf = MentionConfidence.Probable)),
      Seq(curated("ComplexVII Diseaseα", cs = true)), T1))
    assert(ms.size == 1)
    assert(ms.head.matchStr == "ComplexVII Diseaseα")
    assert(tuples(ms) == Set(
      (T1, P1, Complex7Norm, Hl), (T1, P2, Complex7Norm, Hl)))
  }

  test("matches only happen at word boundaries") {
    val ms = scan(assemble(Seq(curated("complexVII diseaseα")),
      Seq(curated("plexVII Dis", cs = true)), T1))
    assert(ms.size == 1)
    assert(ms.map(_.matchStr).toSet == Set("ComplexVII Diseaseα"))
    assert(tuples(ms) == Set((T1, P1, Complex7Norm, Hl)))
  }
}
