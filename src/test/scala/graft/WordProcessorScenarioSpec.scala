package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.TokenClassifier
import graft.ner.TokenClassifier.{Piece, TokSpan, Word}

/** Port of the reference's word-processor decode suite
  * (kazu/tests/test_tokenized_word_processor.py): the BIO/multilabel decode
  * planes driven with EXPLICIT per-word confidences (no model), plus the
  * repeated-suffix strip cases — mapped onto this project's label set
  * (operator ≙ class1, component ≙ class2).
  */
class WordProcessorScenarioSpec extends AnyFunSuite {

  // NOTE the reference fixture writes word_char_end=11 for "you" (an
  // off-by-one its assertions never see — they check classes only); with
  // this project's exclusive ends the correct offset is 12, and match
  // STRINGS are asserted too.
  private val text = "hello to you"

  private def word(id: Int, s: Int, e: Int, logits: Array[Float]): Word =
    Word(IndexedSeq(Piece(0, text.substring(s, e), s, e, id)),
      IndexedSeq(logits), s, e, id)

  // label order: O, B-operator, I-operator, B-component, I-component
  test("single-label decode: B-class1 / O / B-class2 words → two entities") {
    val words = IndexedSeq(
      word(0, 0, 5, Array(0f, 5f, 0f, 0f, 0f)), // hello → B-operator
      word(1, 6, 8, Array(5f, 0f, 0f, 0f, 0f)), // to    → O
      word(2, 9, 12, Array(0f, 0f, 0f, 5f, 0f))) // you  → B-component
    val ments = TokenClassifier.spansToMentions(
      TokenClassifier.findSpans(text, words), text)
    assert(ments.size == 2)
    assert(ments.map(_.entityClass).toSet == Set("operator", "component"))
    assert(ments.map(_.matchStr).toSet == Set("hello", "you"))
  }

  test("multilabel decode: parallel classes span independently " +
    "('hello to' class1 + 'to' class2)") {
    // heaviside-style activations: >0 on a label index activates its class
    val words = IndexedSeq(
      word(0, 0, 5, Array(0f, 1f, 0f, 0f, 0f)), // hello: {operator}
      word(1, 6, 8, Array(0f, 1f, 0f, 1f, 0f)), // to: {operator, component}
      word(2, 9, 12, Array(0f, 0f, 0f, 0f, 0f))) // you: {}
    val ments = TokenClassifier.spansToMentions(
      TokenClassifier.findSpansMultilabel(text, words), text)
    assert(ments.size == 2)
    val byClass = ments.map(m => m.entityClass -> m.matchStr).toMap
    assert(byClass == Map("operator" -> "hello to", "component" -> "to"))
  }

  test("suffix strip: repeated '( (gene|protein)s?)+$' groups strip for the " +
    "configured class and are untouched for others") {
    for (q <- Seq("COX2 protein", "COX2 gene", "COX2 gene protein protein gene")) {
      val span = TokSpan("gene",
        Seq(Word(IndexedSeq.empty, IndexedSeq.empty, 0, q.length, 0)))
      val m = TokenClassifier.spansToMentions(Seq(span), q).head
      assert(m.matchStr == "COX2" && m.spans == Seq(model.CharSpan(0, 4)), q)
      // a class with no strip config keeps the full match
      val noStrip = TokSpan("none",
        Seq(Word(IndexedSeq.empty, IndexedSeq.empty, 0, q.length, 0)))
      val m2 = TokenClassifier.spansToMentions(Seq(noStrip), q).head
      assert(m2.matchStr == q && m2.spans == Seq(model.CharSpan(0, q.length)), q)
    }
  }
}
