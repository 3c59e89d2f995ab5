package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ner.SpacyNer
import graft.ner.SpacyNer._

/** C8 (SpacyNerStep): per-entity append semantics, label lowercasing,
  * HIGHLY_LIKELY default confidence, token-derived sentence spans behind
  * the add_sentence_spans flag, the write-once sentence-span contract, and
  * the EntityRuler-contract stand-in pipeline — replaying
  * kazu/steps/ner/spacy_ner.py:24-41 behaviors. */
class SpacyNerSpec extends AnyFunSuite with SparkTestBase {

  private val ruler = new RulerPipeline(Map(
    "aspirin" -> "DRUG",
    "breast cancer" -> "DISEASE",
    "EGFR" -> "GENE"))

  private def doc(text: String,
                  ents: Seq[Mention] = Seq.empty,
                  sents: Seq[CharSpan] = Seq.empty): KDoc =
    KDoc("doc://t", new java.sql.Timestamp(0L), text, "en",
      Seq(Section("body", text, ents, sents)))

  test("entities appended with lowercased label, literal match, step namespace") {
    val text = "Took aspirin for breast cancer. EGFR rose."
    val out = SpacyNer.processDoc(ruler)(doc(text))
    assert(out.error.isEmpty)
    val es = out.entities
    assert(es.map(e => (e.matchStr, e.entityClass)) ==
      Seq(("aspirin", "drug"), ("breast cancer", "disease"), ("EGFR", "gene")))
    es.foreach { e =>
      assert(e.namespace == SpacyNer.Namespace)
      assert(e.mentionConfidence == MentionConfidence.HighlyLikely)
      assert(text.substring(e.start, e.end) == e.matchStr) // span reslices
      assert(e.matchNorm == graft.text.Normalizer.normalize(e.matchStr, e.entityClass))
      assert(e.isContiguous)
    }
  }

  test("append, never replace: pre-existing entities stay, new ones land after") {
    val text = "aspirin here"
    val prior = Mention("here", "component", Seq(CharSpan(8, 12)), "other",
      MentionConfidence.Possible, graft.text.Normalizer.normalize("here", "component"))
    val out = SpacyNer.processDoc(ruler)(doc(text, ents = Seq(prior)))
    assert(out.entities.head == prior)
    assert(out.entities.map(_.matchStr) == Seq("here", "aspirin"))
  }

  test("sentence spans token-derived (trailing whitespace and leading gap outside)") {
    val text = "  aspirin works.   EGFR too!  "
    val out = SpacyNer.processDoc(ruler)(doc(text))
    val spans = out.sections.head.sentenceSpans
    assert(spans == Seq(CharSpan(2, 16), CharSpan(19, 28)))
    spans.foreach(s => assert(!text.charAt(s.start).isWhitespace &&
      !text.charAt(s.end - 1).isWhitespace))
  }

  test("add_sentence_spans=false: entities only, spans untouched") {
    val out = SpacyNer.processDoc(ruler, Config(addSentenceSpans = false))(
      doc("aspirin sentence one. two."))
    assert(out.sections.head.sentenceSpans.isEmpty)
    assert(out.entities.map(_.matchStr) == Seq("aspirin"))
  }

  test("write-once: pre-set sentence spans route the doc to the failure path") {
    val out = SpacyNer.processDoc(ruler)(
      doc("aspirin.", sents = Seq(CharSpan(0, 8))))
    assert(out.error.exists(_.contains("Immutable sentence_spans is already set")))
  }

  test("with add_sentence_spans=false, pre-set spans are NOT a failure (flag gates the setter)") {
    val out = SpacyNer.processDoc(ruler, Config(addSentenceSpans = false))(
      doc("aspirin.", sents = Seq(CharSpan(0, 8))))
    assert(out.error.isEmpty)
    assert(out.sections.head.sentenceSpans == Seq(CharSpan(0, 8)))
  }

  test("ruler is the PhraseMatcher contract: token boundaries, filter_spans, non-overlapping") {
    // "aspiriner" must NOT match "aspirin" (token boundary)
    assert(SpacyNer.processDoc(ruler)(doc("aspiriner")).entities.isEmpty)
    // multi-token wins over any single-token prefix pattern at the same start
    val p2 = new RulerPipeline(Map("breast" -> "TISSUE", "breast cancer" -> "DISEASE"))
    val out = SpacyNer.processDoc(p2)(doc("breast cancer ward"))
    assert(out.entities.map(e => (e.matchStr, e.entityClass)) ==
      Seq(("breast cancer", "disease")))
    // equal length → earlier start wins, overlap dropped
    val p3 = new RulerPipeline(Map("a b" -> "X", "b c" -> "Y"))
    val out3 = SpacyNer.processDoc(p3)(doc("a b c"))
    assert(out3.entities.map(_.matchStr) == Seq("a b"))
  }

  test("filter_spans: the LONGEST span wins even when it starts later (spacy.util.filter_spans)") {
    // greedy left-to-right would emit "a b"; filter_spans keeps "b c c"
    val p = new RulerPipeline(Map("a b" -> "X", "b c c" -> "Y"))
    val out = SpacyNer.processDoc(p)(doc("a b c c"))
    assert(out.entities.map(e => (e.matchStr, e.entityClass)) == Seq(("b c c", "y")))
  }

  test("identical token sequences tie-break deterministically (lexicographic phrase)") {
    // "breast cancer" and "breast  cancer" tokenize identically; the
    // lexicographically smaller phrase ("breast  cancer", double space)
    // wins regardless of Map hash order
    val p = new RulerPipeline(Map(
      "breast cancer" -> "DISEASE", "breast  cancer" -> "TISSUE"))
    val out = SpacyNer.processDoc(p)(doc("breast cancer ward"))
    assert(out.entities.map(_.entityClass) == Seq("tissue"))
  }

  test("duplicate sentence spans from a pipeline route to the failure path (reference assert)") {
    val dup = new SpacyLikePipeline {
      def processSingle(text: String): SpacyDoc =
        SpacyDoc(Seq.empty, Seq((0, 4), (0, 4)))
    }
    val out = SpacyNer.processDoc(dup)(doc("text"))
    assert(out.error.contains(
      s"${SpacyNer.Namespace}: There are duplicate sentence spans"))
  }

  test("partial work survives a mid-document failure (in-place mutation fidelity)") {
    // section 0 processes fully; section 1 has pre-set spans → the doc
    // fails, but keeps section 0's appended entity + spans AND section 1's
    // entities appended before the setter raised (spacy_ner.py order)
    val d = KDoc("doc://t", new java.sql.Timestamp(0L), "x", "en", Seq(
      Section("s0", "aspirin works."),
      Section("s1", "aspirin again.", sentenceSpans = Seq(CharSpan(0, 3)))))
    val out = SpacyNer.processDoc(ruler)(d)
    assert(out.error.exists(_.contains("Immutable sentence_spans is already set")))
    val Seq(s0, s1) = out.sections
    assert(s0.entities.map(_.matchStr) == Seq("aspirin") &&
      s0.sentenceSpans == Seq(CharSpan(0, 14)))
    assert(s1.entities.map(_.matchStr) == Seq("aspirin") && // appended pre-raise
      s1.sentenceSpans == Seq(CharSpan(0, 3)))              // untouched
  }

  test("dataset plane: narrow mapPartitions, per-partition pipeline") {
    val s = spark
    import s.implicits._
    val docs = s.createDataset(Seq(
      doc("aspirin first."), doc("no hits here.")))
    // local val so the factory closure serializes the pipeline, not the spec
    val r = ruler
    val out = SpacyNer.annotate(s, docs, () => r).collect()
    assert(out.flatMap(_.entities).map(_.matchStr).toSeq == Seq("aspirin"))
    // narrow: no shuffle in the plan
    val plan = SpacyNer.annotate(s, docs, () => r)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
