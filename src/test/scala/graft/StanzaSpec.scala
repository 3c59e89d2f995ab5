package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ner.StanzaSentencer
import graft.ner.StanzaSentencer._

/** C10 (StanzaStep): token-derived sentence spans
  * (stanza.py:113-116 — first-token start to last-token end), the
  * write-once sentence-span contract (kazu/data/__init__.py:466-481), and
  * the failure-path routing. */
class StanzaSpec extends AnyFunSuite with SparkTestBase {

  private def doc(text: String, sents: Seq[CharSpan] = Seq.empty): KDoc =
    KDoc("doc://t", new java.sql.Timestamp(0L), text, "en",
      Seq(Section("body", text, sentenceSpans = sents)))

  test("spans are token-derived: whitespace outside, punctuation token inside") {
    val text = "  One two.   Three!  "
    val out = StanzaSentencer.processDoc(MiniGeniaPipeline)(doc(text))
    assert(out.error.isEmpty)
    val spans = out.sections.head.sentenceSpans
    // B6 full-cover spans would be [0,10) and [13,19)+trailing; stanza's
    // token-derived spans start at the first token and end at the final
    // punctuation TOKEN, excluding all whitespace
    assert(spans == Seq(CharSpan(2, 10), CharSpan(13, 19)))
    assert(text.substring(2, 10) == "One two." && text.substring(13, 19) == "Three!")
  }

  test("all-whitespace text yields no sentences (no token-less sentence)") {
    val out = StanzaSentencer.processDoc(MiniGeniaPipeline)(doc("   \t  "))
    assert(out.error.isEmpty)
    assert(out.sections.head.sentenceSpans.isEmpty)
  }

  test("unterminated trailing text is a final sentence ending at its last token") {
    val out = StanzaSentencer.processDoc(MiniGeniaPipeline)(doc("Done. tail word  "))
    assert(out.sections.head.sentenceSpans == Seq(CharSpan(0, 5), CharSpan(6, 15)))
  }

  test("write-once: a doc with spans already set routes to the failure path") {
    val out = StanzaSentencer.processDoc(MiniGeniaPipeline)(
      doc("One.", sents = Seq(CharSpan(0, 4))))
    assert(out.error.exists(_.contains("Immutable sentence_spans is already set")))
    assert(out.error.exists(_.startsWith(StanzaSentencer.Namespace)))
  }

  test("failure is per-document: a bad doc never poisons its neighbors") {
    val s = spark
    import s.implicits._
    val docs = s.createDataset(Seq(
      doc("Good one. Fine."),
      doc("Bad.", sents = Seq(CharSpan(0, 4)))))
    val out = StanzaSentencer.annotate(s, docs).collect().sortBy(_.error.isDefined)
    assert(out(0).error.isEmpty && out(0).sections.head.sentenceSpans.size == 2)
    assert(out(1).error.isDefined)
    // narrow plan, no shuffle
    val plan = StanzaSentencer.annotate(s, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("MiniGeniaPipeline reproduces the LITERAL oracle constants (oracle independence)") {
    // the kg_stanza_sentences oracle pins hand-derived span literals; this
    // is the spec-side half of that independence — a tokenizer/sentencizer
    // regression breaks THIS assertion and the driver gate, not neither
    SparkEntry.stanzaPlantedTails.take(2).foreach { case (tail, expected) =>
      val got = MiniGeniaPipeline.sentenceSpans(". " + tail).filter(_._1 >= 2)
      assert(got == expected, s"tail '$tail'")
    }
  }

  test("duplicate sentence spans route to the failure path with the reference assert text") {
    val dup = new StanzaLikePipeline {
      def sentenceSpans(text: String): Seq[(Int, Int)] = Seq((0, 3), (0, 3))
    }
    val out = StanzaSentencer.processDoc(dup)(doc("abc"))
    assert(out.error.contains(
      s"${StanzaSentencer.Namespace}: There are duplicate sentence spans"))
  }

  test("partial work survives a mid-document failure (in-place mutation fidelity)") {
    val d = KDoc("doc://t", new java.sql.Timestamp(0L), "x", "en", Seq(
      Section("s0", "One two."),
      Section("s1", "Bad.", sentenceSpans = Seq(CharSpan(0, 4))),
      Section("s2", "Never reached.")))
    val out = StanzaSentencer.processDoc(MiniGeniaPipeline)(d)
    assert(out.error.isDefined)
    val Seq(s0, s1, s2) = out.sections
    assert(s0.sentenceSpans == Seq(CharSpan(0, 8)))  // kept: set before raise
    assert(s1.sentenceSpans == Seq(CharSpan(0, 4)))  // untouched
    assert(s2.sentenceSpans.isEmpty)                 // never reached
  }

  test("entities and existing section fields pass through untouched") {
    val m = Mention("One", "gene", Seq(CharSpan(0, 3)), "other",
      MentionConfidence.Possible, graft.text.Normalizer.normalize("One", "gene"))
    val d = KDoc("doc://t", new java.sql.Timestamp(0L), "One two.", "en",
      Seq(Section("body", "One two.", Seq(m))))
    val out = StanzaSentencer.processDoc(MiniGeniaPipeline)(d)
    assert(out.entities == Seq(m))
    assert(out.sections.head.sentenceSpans == Seq(CharSpan(0, 8)))
  }
}
