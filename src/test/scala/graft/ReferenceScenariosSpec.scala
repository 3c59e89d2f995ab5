package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ontology._
import graft.index.Resources
import graft.ner.TrieNer

/** The reference's shared string-matching scenarios
  * (kazu/tests/string_matching_utils.py: two mock parsers, the
  * "complexVII diseaseα" synonym, curated case-sensitivity/behaviour
  * variants) replayed against our trie NER stage.
  */
class ReferenceScenariosSpec extends AnyFunSuite {

  private val FirstParser = "first_mock_parser"
  private val SecondParser = "second_mock_parser"
  private val TargetIdx = "http://my.fake.ontology/complex_disease_123"
  private val Complex7Norm = "COMPLEX 7 DISEASE ALPHA"
  private val EntType1 = "ent_type_1"
  private val EntType2 = "ent_type_2"
  private val SynText = "complexVII diseaseα"
  private val DocText =
    "There is a ComplexVII Diseaseα in this sentence, amongst other things."

  private def candidate(parser: String) = LinkingCandidate(
    parserName = parser,
    synonymNorm = Complex7Norm,
    rawSynonyms = Seq(SynText),
    isSymbolic = false,
    mappingTypes = Seq("test"),
    associatedIdSets = Seq(EquivalentIdSet(Seq(IdAndSource(TargetIdx, parser)))),
    aggregatedBy = IdAggregation.Unambiguous)

  private def resource(parser: String, cls: String,
      caseSensitive: Boolean = false,
      behaviour: String = Behaviour.AddForNerAndLinking,
      text: String = SynText) = StringResource(
    parserName = parser, entityClass = cls,
    synNorm = graft.text.Normalizer.normalize(text, cls),
    synonyms = Seq(SynonymSpec(text, caseSensitive, MentionConfidence.HighlyLikely)),
    behaviour = behaviour)

  private def buildRes(resources: Seq[StringResource],
      extraCandidates: Seq[LinkingCandidate] = Seq.empty): Resources =
    Resources.assemble(
      Map(FirstParser -> EntType1, SecondParser -> EntType2),
      Seq(candidate(FirstParser), candidate(SecondParser)) ++ extraCandidates,
      Seq(MetadataRow(FirstParser, TargetIdx, "Complex Disease Alpha VII"),
        MetadataRow(SecondParser, TargetIdx, "Complex Disease Alpha VII")),
      resources,
      version = s"scenario-${resources.hashCode}")

  test("synonym normalization matches the reference constant") {
    assert(graft.text.Normalizer.normalize(SynText, EntType1) == Complex7Norm)
  }

  test("two case-insensitive resources from two parsers: both hit") {
    val res = buildRes(Seq(
      resource(FirstParser, EntType1), resource(SecondParser, EntType2)))
    val ments = TrieNer.matchText(res, DocText)
    assert(ments.size == 2) // one entity per class
    assert(ments.map(_.matchStr).toSet == Set("ComplexVII Diseaseα"))
    assert(ments.map(_.entityClass).toSet == Set(EntType1, EntType2))
    assert(ments.forall(_.mentionConfidence == MentionConfidence.HighlyLikely))
    assert(ments.forall(_.candidates.nonEmpty))
  }

  test("case-sensitive second resource: only first parser hits") {
    val res = buildRes(Seq(
      resource(FirstParser, EntType1),
      resource(SecondParser, EntType2, caseSensitive = true)))
    val ments = TrieNer.matchText(res, DocText)
    assert(ments.size == 1)
    assert(ments.head.entityClass == EntType1)
  }

  test("ADD_FOR_LINKING_ONLY second resource: not matched by NER") {
    val res = buildRes(Seq(
      resource(FirstParser, EntType1),
      resource(SecondParser, EntType2, behaviour = Behaviour.AddForLinkingOnly)))
    val ments = TrieNer.matchText(res, DocText)
    assert(ments.size == 1)
    assert(ments.head.entityClass == EntType1)
  }

  test("same class at different confidences: one entity at the max " +
    "(ref max_mention_test_case)") {
    // parser 1: case-insensitive PROBABLE; parser 2: case-sensitive
    // HIGHLY_LIKELY with the exact-cased surface form, SAME entity class —
    // the single aggregated hit must take the higher confidence and carry
    // both parsers' candidates (test_memory_efficient_string_matching
    // .py:43-130)
    val res = buildRes(Seq(
      resource(FirstParser, EntType1).copy(synonyms = Seq(
        graft.ontology.SynonymSpec(SynText, caseSensitive = false,
          MentionConfidence.Probable))),
      resource(SecondParser, EntType1, caseSensitive = true,
        text = "ComplexVII Diseaseα")))
    val ments = TrieNer.matchText(res, DocText)
    assert(ments.size == 1)
    assert(ments.head.mentionConfidence == MentionConfidence.HighlyLikely)
    assert(ments.head.candidates.map(_.candidate.parserName).toSet ==
      Set(FirstParser, SecondParser))
    // a lowercase occurrence: the case-sensitive resource doesn't fire, so
    // the hit falls back to the case-insensitive PROBABLE reading
    val lower = TrieNer.matchText(res, DocText.toLowerCase)
    assert(lower.size == 1)
    assert(lower.head.mentionConfidence == MentionConfidence.Probable)
  }

  test("novel curated synonym is matched and carries its syn_norm") {
    val novel = "This sentence is just to test"
    val novelNorm = graft.text.Normalizer.normalize(novel, EntType1)
    assert(novelNorm == "THIS SENTENCE IS JUST TO TEST")
    val res = buildRes(
      Seq(resource(FirstParser, EntType1, text = novel)
        .copy(synNorm = novelNorm)),
      extraCandidates = Seq(candidate(FirstParser).copy(
        synonymNorm = novelNorm, rawSynonyms = Seq(novel))))
    val ments = TrieNer.matchText(res, s"Something else. $novel. And more.")
    assert(ments.size == 1)
    assert(ments.head.matchStr == novel)
    assert(ments.head.candidates.head.candidate.synonymNorm == novelNorm)
  }
}

/** E16: span-identical entities of different classes, disambiguated by
  * expected-context tf-idf (reference "UCB" example). */
class EntityClassDisambiguationSpec extends AnyFunSuite {
  import graft.link.EntityClassDisambiguation._
  import graft.text.Tokenizer

  private val cfg = Config(Map(
    "UCB" -> Seq(
      DisambiguationEntry("anatomy",
        Seq("umbilical cord blood baby placenta pregnancy"), 0.05),
      DisambiguationEntry("company",
        Seq("company business pharmaceutical corporate stock"), 0.05))))

  private def doc(text: String): KDoc = {
    val span = {
      val i = text.indexOf("UCB")
      Seq(CharSpan(i, i + 3))
    }
    val e1 = Mention("UCB", "anatomy", span, "t", 50, "UCB")
    val e2 = Mention("UCB", "company", span, "t", 50, "UCB")
    KDoc("u", new java.sql.Timestamp(0), text, "en", Seq(
      Section("body", text, Seq(e1, e2),
        sentenceSpans = Tokenizer.sentenceSpans(text))))
  }

  test("anatomical context keeps the anatomy entity") {
    val d = processDoc(cfg)(doc(
      "The baby placenta was examined. UCB was collected during pregnancy."))
    assert(d.entities.map(_.entityClass) == Seq("anatomy"))
  }

  test("corporate context keeps the company entity") {
    val d = processDoc(cfg)(doc(
      "The pharmaceutical company reported stock gains. UCB announced business results."))
    assert(d.entities.map(_.entityClass) == Seq("company"))
  }

  test("no matching context drops all span-sharing entities") {
    val d = processDoc(cfg)(doc(
      "Totally unrelated words here. UCB appears without context signals."))
    assert(d.entities.isEmpty)
  }

  test("single-class spans untouched") {
    val text = "UCB alone"
    val e = Mention("UCB", "company", Seq(CharSpan(0, 3)), "t", 50, "UCB")
    val d = KDoc("u", new java.sql.Timestamp(0), text, "en",
      Seq(Section("body", text, Seq(e))))
    assert(processDoc(cfg)(d).entities.size == 1)
  }
}
