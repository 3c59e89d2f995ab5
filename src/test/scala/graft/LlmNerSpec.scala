package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ner.LlmNer
import graft.ner.LlmNer._

/** C7 LLM-NER harness: result parsing (repair + strict), section
  * strategies, and AC span reconciliation — replaying the reference's
  * llm_ner.py edge cases over scripted backbones. */
class LlmNerSpec extends AnyFunSuite with SparkTestBase {

  private def doc(texts: String*): KDoc =
    KDoc("u://d", new java.sql.Timestamp(0L), texts.mkString("\n"), "en",
      sections = texts.zipWithIndex.map { case (t, i) => Section(s"s$i", t) })

  private final case class Scripted(responses: Map[String, String]) extends LlmModel {
    def complete(text: String): String =
      responses.getOrElse(text, """{"nothing": "x"}""")
  }

  // ---- FreeFormResultParser ------------------------------------------------

  test("free-form: JSON object embedded in prose") {
    val r = FreeFormResultParser.parse(
      """Sure! Here you go: {"BRCA1": "gene", "imatinib": "drug"} — hope that helps""")
    assert(r == Vector("BRCA1" -> "gene", "imatinib" -> "drug"))
  }

  test("free-form: array of objects merges in order, later items override IN PLACE") {
    // dict.update semantics: overridden keys keep their first-insertion
    // position — [a->z, b->y], not [b->y, a->z]
    val r = FreeFormResultParser.parse("""[{"a": "x"}, {"b": "y"}, {"a": "z"}]""")
    assert(r == Vector("a" -> "z", "b" -> "y"))
  }

  test("free-form: in-place override decides which case variant wins the automaton") {
    // python: {A:1} → {a:2} → {A:3} gives order [A->3, a->2]; the automaton
    // map lowercases in iteration order so ("a", "2") wins — NOT ("A", "3")
    val r = FreeFormResultParser.parse("""[{"A": "1"}, {"a": "2"}, {"A": "3"}]""")
    assert(r == Vector("A" -> "3", "a" -> "2"))
    val d = doc("a word")
    val m = Scripted(Map("a word" -> """[{"A": "1"}, {"a": "2"}, {"A": "3"}]"""))
    val (out, _) = LlmNer.processDoc(m, FreeFormResultParser)(d)
    assert(out.sections.head.entities.map(e => (e.matchStr, e.entityClass)) ==
      Seq(("a", "2")))
  }

  test("free-form: the '{}' shortcut fires even when a valid object follows (ref quirk)") {
    assert(FreeFormResultParser.parse("""{} {"a": "x"}""").isEmpty)
  }

  test("free-form: no braces / bare array / malformed all degrade to empty") {
    assert(FreeFormResultParser.parse("no entities found").isEmpty)
    assert(FreeFormResultParser.parse("[1, 2]").isEmpty) // no '{' → dict branch fails
    assert(FreeFormResultParser.parse("""{"a": """).isEmpty)
    assert(FreeFormResultParser.parse("").isEmpty)
  }

  test("free-form: array AFTER the object is ignored; non-string values stringify") {
    assert(FreeFormResultParser.parse("""{"a": "x"} [1]""") == Vector("a" -> "x"))
    assert(FreeFormResultParser.parse("""{"a": 5}""") == Vector("a" -> "5"))
  }

  // ---- StructuredOutputResultParser ---------------------------------------

  test("structured: array-of-objects with configurable class key; strict on malformed") {
    val p = StructuredOutputResultParser("entity_class")
    assert(p.parse("""[{"entity_match": "BRCA1", "entity_class": "gene"}]""")
      == Vector("BRCA1" -> "gene"))
    intercept[Exception](p.parse("""[{"entity_match": "BRCA1"}]"""))
    intercept[Exception](p.parse("""{"not": "an array"}"""))
  }

  test("structured failure surfaces as a failed-document row, not a task abort") {
    val m = Scripted(Map("alpha beta" -> "garbage"))
    val (out, raws) = LlmNer.processDoc(m, StructuredOutputResultParser("entity_class"),
      ConcatenateAndProcess)(doc("alpha beta"))
    assert(out.error.isDefined && out.error.get.startsWith("LLMNERStep:"))
    assert(raws.map(_.raw) == Seq("garbage"))
  }

  // ---- section strategies + reconciliation --------------------------------

  test("concatenate: one call on \\n-joined text; case-insensitive AC match keeps original key case") {
    val d = doc("alpha beta", "beta gamma")
    val m = Scripted(Map("alpha beta\nbeta gamma" -> """{"Alpha": "one", "beta": "two"}"""))
    val (out, raws) = LlmNer.processDoc(m, FreeFormResultParser)(d)
    assert(out.error.isEmpty)
    assert(raws == Seq(RawResponse("<doc>", """{"Alpha": "one", "beta": "two"}""")))
    val s0 = out.sections(0).entities
    val s1 = out.sections(1).entities
    // section 0: "alpha"→ matchStr "Alpha" (stored case), "beta" at 6..10
    assert(s0.map(e => (e.matchStr, e.entityClass, e.start, e.end)).toSet ==
      Set(("Alpha", "one", 0, 5), ("beta", "two", 6, 10)))
    assert(s1.map(e => (e.matchStr, e.start)).toSet == Set(("beta", 0)))
  }

  test("word boundaries: no substring matches inside larger tokens") {
    val d = doc("beta betamax abetas")
    val m = Scripted(Map("beta betamax abetas" -> """{"beta": "x"}"""))
    val (out, _) = LlmNer.processDoc(m, FreeFormResultParser)(d)
    assert(out.sections.head.entities.map(e => (e.start, e.end)) == Seq((0, 4)))
  }

  test("individual+drop: failed section removed, others annotated") {
    val d = doc("alpha one", "junk text")
    val m = Scripted(Map(
      "alpha one" -> """{"alpha": "cls"}""",
      "junk text" -> "unparseable"))
    val (out, raws) = LlmNer.processDoc(m, FreeFormResultParser,
      ProcessIndividuallyAndDropFailedSections)(d)
    assert(out.error.isEmpty)
    assert(out.sections.map(_.name) == Seq("s0")) // s1 dropped
    assert(out.sections.head.entities.map(_.matchStr) == Seq("alpha"))
    // reversed processing order: s1 called first
    assert(raws.map(_.sectionName) == Seq("s1", "s0"))
  }

  test("individual+keep: a failed section fails the document (ref raises despite the name)") {
    val d = doc("alpha one", "junk text")
    val m = Scripted(Map(
      "alpha one" -> """{"alpha": "cls"}""",
      "junk text" -> "unparseable"))
    val (out, _) = LlmNer.processDoc(m, FreeFormResultParser,
      ProcessIndividuallyAndKeepFailedSections)(d)
    assert(out.error.exists(_.contains("Failed to parse result")))
  }

  test("individual: reversed processing makes EARLIER sections win key conflicts; keys lower+strip") {
    val d = doc("shared term", "shared term two")
    val m = Scripted(Map(
      "shared term" -> """{" Shared ": "first"}""",
      "shared term two" -> """{"shared": "second"}"""))
    val (out, _) = LlmNer.processDoc(m, FreeFormResultParser,
      ProcessIndividuallyAndDropFailedSections)(d)
    // key " Shared " lower+strips to "shared"; section 0 processed LAST → wins
    assert(out.sections.flatMap(_.entities).map(_.entityClass).distinct == Seq("first"))
    assert(out.sections.flatMap(_.entities).map(_.matchStr).distinct == Seq("shared"))
  }

  test("dictionary backbone end-to-end over the Dataset plane") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      doc("spark filter window"), doc("nothing here")))
    val out = LlmNer.annotate(spark, docs,
      () => DictionaryBackbone(Seq("spark" -> "component", "filter" -> "operator")),
      FreeFormResultParser).collect().sortBy(_.url)
    val ents = out.flatMap(_.entities)
    assert(ents.map(e => (e.matchStr, e.entityClass)).toSet ==
      Set(("spark", "component"), ("filter", "operator")))
    assert(ents.forall(_.namespace == LlmNer.Namespace))
  }
}
