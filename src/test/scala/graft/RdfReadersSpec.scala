package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ontology._
import graft.ontology.RdfGraphReader.{Config, HasExactSynonym, RdfsLabel}
import graft.ontology.Rdf.Direct

/** Concrete ontology parsers vs hand-verified fixture slices shaped like the
  * real public ontologies (GO as turtle, a SKOS-XL vocabulary, Mondo as
  * OBO-Graphs JSON), pinning the RDFGraphParser / SKOSXLGraphParser /
  * MondoOntologyParser row semantics (parsers.py:467-994): URI-regex subject
  * filtering, include/exclude entity patterns, label+synonym row emission
  * with predicate-string mapping types, obsolete-label dropping, exact-only
  * synonym selection, and lbl-less node skipping.
  */
class RdfReadersSpec extends AnyFunSuite {

  private val res = "src/test/resources/ontology"

  test("GO turtle slice: regex, exact synonyms, obsolete + deprecated drops") {
    val rows = RdfGraphReader.readFile(s"$res/go_slice.ttl", Config(
      parserName = "GO", entityClass = "bio",
      uriRegex = "^http://purl.obolibrary.org/obo/GO_[0-9]+$",
      synonymPredicates = Seq(Direct(HasExactSynonym)),
      excludeEntityPatterns = Seq(
        ("http://www.w3.org/2002/07/owl#deprecated", "true")),
      dropObsoleteLabels = true))
    def row(idx: String, label: String, syn: String, mt: String) =
      OntologyRow("GO", "bio", s"http://purl.obolibrary.org/obo/$idx", label, syn, mt)
    val expected = Set(
      row("GO_0008150", "biological_process", "biological_process", RdfsLabel),
      row("GO_0008150", "biological_process", "biological process", HasExactSynonym),
      row("GO_0008150", "biological_process", "physiological process", HasExactSynonym),
      row("GO_0003674", "molecular_function", "molecular_function", RdfsLabel),
      row("GO_0003674", "molecular_function", "molecular function", HasExactSynonym),
      row("GO_0005575", "cellular_component", "cellular_component", RdfsLabel))
    assert(rows.toSet == expected)
    // and without the GO-specific obsolete filter, the obsolete term returns
    val keepObsolete = RdfGraphReader.readFile(s"$res/go_slice.ttl", Config(
      parserName = "GO", entityClass = "bio",
      uriRegex = "^http://purl.obolibrary.org/obo/GO_[0-9]+$"))
    assert(keepObsolete.exists(_.defaultLabel.contains("obsolete")))
    assert(keepObsolete.exists(_.idx.endsWith("GO_0000006"))) // no exclude patterns
  }

  test("SKOS-XL turtle: two-step pref/alt label property paths") {
    val rows = RdfGraphReader.readFile(s"$res/statuses_skosxl.ttl",
      RdfGraphReader.skosXl("STATUS", "status", "^http://example.org/status/"))
    val prefShow = RdfGraphReader.SkosXlPrefLabel.show
    val altShow = RdfGraphReader.SkosXlAltLabel.show
    def row(idx: String, label: String, syn: String, mt: String) =
      OntologyRow("STATUS", "status", s"http://example.org/status/$idx", label, syn, mt)
    assert(rows.toSet == Set(
      row("S001", "active", "active", prefShow),
      row("S001", "active", "running", altShow),
      row("S001", "active", "live", altShow),
      row("S002", "inactive", "inactive", prefShow)))
  }

  test("Mondo OBO-Graphs JSON: lbl + hasExactSynonym only; HP ids kept") {
    val rows = OboGraphReader.readFile(s"$res/mondo_slice.json", "MONDO", "disease")
    def row(idx: String, label: String, syn: String, mt: String) =
      OntologyRow("MONDO", "disease", s"http://purl.obolibrary.org/obo/$idx", label, syn, mt)
    assert(rows.toSet == Set(
      row("MONDO_0004979", "asthma", "asthma", "lbl"),
      row("MONDO_0004979", "asthma", "bronchial asthma", "hasExactSynonym"),
      row("MONDO_0004979", "asthma", "asthma, bronchial", "hasExactSynonym"),
      row("MONDO_0005015", "diabetes mellitus", "diabetes mellitus", "lbl"),
      row("HP_0002099", "asthma attack", "asthma attack", "lbl")))
    assert(OboGraphReader.findKb("http://purl.obolibrary.org/obo/MONDO_0004979") == "MONDO")
    assert(OboGraphReader.findKb("http://purl.obolibrary.org/obo/HP_0002099") == "HP")
  }

  test("parsed ontology feeds the resource build and trie NER end-to-end") {
    val rows = RdfGraphReader.readFile(s"$res/statuses_skosxl.ttl",
      RdfGraphReader.skosXl("STATUS", "status", "^http://example.org/status/"))
    val resources = graft.index.Resources.build(rows, _ => "status",
      version = "skosxl-fixture/1")
    val mentions = graft.ner.TrieNer.matchText(resources,
      "the job is running but the other one is inactive")
    assert(mentions.map(m => (m.matchStr, m.entityClass)).toSet ==
      Set(("running", "status"), ("inactive", "status")))
  }

  test("turtle \\uXXXX / \\UXXXXXXXX escapes decode to their code points") {
    // exported OBO/SKOS dumps commonly unicode-escape non-ASCII labels; a
    // tokenizer that keeps the hex digits as text would plant garbage
    // synonyms ("u03B2-blocker") into the gazetteer with no error
    // built by concatenation so the Scala lexer cannot pre-process the
    // \u sequence — the PARSER must see the raw backslash-u-hex bytes
    val bs = "\\"
    val g = graft.ontology.Rdf.Turtle.parse(
      s"""<http://x/1> <http://www.w3.org/2000/01/rdf-schema#label> "${bs}u03B2-blocker" .
        |<http://x/2> <http://www.w3.org/2000/01/rdf-schema#label> "${bs}U0001F9EA lab" .
        |<http://x/3> <http://www.w3.org/2000/01/rdf-schema#label> "tab${bs}there" .""".stripMargin)
    val labels = g.triples.map(t => t.subj -> t.obj.value).toMap
    assert(labels("http://x/1") == "β-blocker")
    assert(labels("http://x/2") == new String(Character.toChars(0x1F9EA)) + " lab")
    assert(labels("http://x/3") == "tab\there") // single-char escapes intact
  }
}
