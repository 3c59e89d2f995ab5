package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.TokenClassifier
import graft.link.ClassFilter
import graft.model._

class TokenClassifierSpec extends AnyFunSuite {
  private val session = TokenClassifier.executorSession

  test("wordpieces carry offsets and word ids") {
    val ps = TokenClassifier.wordpieces("window stream")
    assert(ps.map(_.token) == Seq("wind", "##ow", "stre", "##am"))
    assert(ps.map(p => (p.start, p.end)) == Seq((0, 4), (4, 6), (7, 11), (11, 13)))
    assert(ps.map(_.wordId) == Seq(0, 0, 1, 1))
  }

  test("model tags vocab words via BIO decode") {
    val ments = TokenClassifier.processText(session, "the window is big")
    assert(ments.map(m => (m.matchStr, m.entityClass)) ==
      Seq(("window", "operator")))
    assert(ments.head.spans == Seq(CharSpan(4, 10)))
    assert(ments.head.namespace == TokenClassifier.Namespace)
  }

  test("adjacent tagged words extend spans (copy-on-new-B)") {
    val ments = TokenClassifier.processText(session, "window sort runs")
    // reference SimpleSpanFinder emits both the first word alone (closed on
    // second B) and the extended two-word span
    assert(ments.map(_.matchStr).toSet == Set("window", "window sort"))
  }

  test("span-breaking chars close spans") {
    val ments = TokenClassifier.processText(session, "window (sort) done")
    assert(ments.map(_.matchStr).toSet == Set("window", "sort"))
  }

  test("long text: sliding window + stitch preserves all detections") {
    // > 126 wordpieces forces multiple frames
    val filler = Seq.fill(80)("abcdefgh").mkString(" ") // 2 pieces each
    val text = s"window starts. $filler vector ends."
    val ments = TokenClassifier.processText(session, text)
    assert(ments.map(_.matchStr).toSet == Set("window", "vector"))
    // offsets must still be exact after stitching
    ments.foreach { m =>
      assert(text.substring(m.start, m.end) == m.matchStr)
    }
  }

  test("gene suffix stripping") {
    val spans = Seq(TokenClassifier.TokSpan("gene",
      Seq(TokenClassifier.Word(IndexedSeq.empty, IndexedSeq.empty, 0, 9, 0))))
    val m = TokenClassifier.spansToMentions(spans, "COX2 gene etc").head
    assert(m.matchStr == "COX2")
    assert(m.spans == Seq(CharSpan(0, 4)))
  }
}

class ClassFilterSpec extends AnyFunSuite {
  private def ent(text: String, s: Int, e: Int, cls: String): Mention =
    Mention(text.substring(s, e), cls, Seq(CharSpan(s, e)), "t", 50, "N")

  private def doc(text: String, ents: Mention*): KDoc =
    KDoc("u", new java.sql.Timestamp(0), text, "en",
      Seq(Section("body", text, ents.toSeq)))

  test("fp rule firing anywhere drops all entities with the key") {
    val text = "insulin gene found. insulin protein elsewhere."
    val rules = ClassFilter.Rules(mentionRules = Map(
      "gene" -> Map("insulin" -> Map(
        "fp" -> Seq(Seq(ClassFilter.TokenRule(lower = Some("insulin")),
          ClassFilter.TokenRule(lower = Some("protein"))))))))
    val d = ClassFilter.processDoc(rules)(doc(text,
      ent(text, 0, 7, "gene"), ent(text, 20, 27, "gene")))
    assert(d.entities.isEmpty) // fp fired in sentence 2 → both dropped
  }

  test("tp rule must fire somewhere or entities are dropped") {
    val text = "sort appears here."
    val rules = ClassFilter.Rules(classRules = Map(
      "operator" -> Map("tp" -> Seq(Seq(
        ClassFilter.TokenRule(lower = Some("query")))))))
    val dropped = ClassFilter.processDoc(rules)(doc(text, ent(text, 0, 4, "operator")))
    assert(dropped.entities.isEmpty)
    val text2 = "sort the query now."
    val kept = ClassFilter.processDoc(rules)(doc(text2, ent(text2, 0, 4, "operator")))
    assert(kept.entities.size == 1)
  }

  test("rules only affect configured keys") {
    val text = "sort here."
    val rules = ClassFilter.Rules(classRules = Map(
      "gene" -> Map("tp" -> Seq(Seq(ClassFilter.TokenRule(lower = Some("xx")))))))
    val d = ClassFilter.processDoc(rules)(doc(text, ent(text, 0, 4, "operator")))
    assert(d.entities.size == 1)
  }
}
