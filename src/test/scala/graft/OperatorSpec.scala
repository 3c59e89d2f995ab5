package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ontology.SynonymGeneration
import graft.ner.EntitySplitter
import graft.link.{EmbeddingLinking, Xref}
import graft.index.Resources
import graft.ontology.OntologyRow

class SynonymGenerationSpec extends AnyFunSuite {
  test("separator expansion splits bracketed expressions") {
    assert(SynonymGeneration.SeparatorExpansion.generate("EGFR (gene)") ==
      Set("EGFR", "gene", "EGFR gene"))
    assert(SynonymGeneration.SeparatorExpansion.generate("plain") == Set.empty)
  }

  test("stopword removal drops every stopword token (ref semantics)") {
    val g = SynonymGeneration.StopWordRemover.default
    assert(g.generate("the breast cancer") == Set("breast cancer"))
    // interior stopwords are removed too (ref StopWordRemover :157-175)
    assert(g.generate("cancer of the breast") == Set("cancer breast"))
    // reference scenario: test_StopWordRemover
    assert(g.generate("The cat sat in the mat") == Set("cat sat mat"))
    // nothing detected → nothing emitted
    assert(g.generate("breast cancer").isEmpty)
  }

  // Literal ports of the reference's generator scenarios
  // (kazu/tests/test_synonym_generators.py:35-152).
  test("reference SeparatorExpansion scenarios") {
    val g = SynonymGeneration.SeparatorExpansion
    assert(g.generate("ABAC (ABAC1/ABAC2)") == Set(
      "ABAC", "ABAC1", "ABAC2", "ABAC1/ABAC2", "ABAC ABAC1/ABAC2"))
    assert(g.generate("cyclin-dependent kinase inhibitor 1B (p27, Kip1)") == Set(
      "cyclin-dependent kinase inhibitor 1B", "p27", "Kip1", "p27, Kip1",
      "cyclin-dependent kinase inhibitor 1B p27, Kip1"))
    assert(g.generate("gonadotropin-releasing hormone (type 2) receptor 2") ==
      Set("gonadotropin-releasing hormone receptor 2"))
    assert(g.generate("oxidase (cytochrome c) assembly 1-like") ==
      Set("oxidase assembly 1-like"))
  }

  test("reference StringReplacement scenario") {
    val g = new SynonymGeneration.StringReplacement(
      replacementDict = Map("cat" -> Seq("dog", "chicken")))
    assert(g.generate("The cat sat on the mat") == Set(
      "The dog sat on the mat", "The chicken sat on the mat"))
  }

  test("reference GreekSymbolSubstitution scenarios (incl. the xfailed pair)") {
    val g = SynonymGeneration.GreekSubstitution
    assert(g.generate("alpha-thalassaemia") ==
      Set("α-thalassaemia", "Α-thalassaemia"))
    assert(g.generate("α-thalassaemia") ==
      Set("alpha-thalassaemia", "a-thalassaemia", "Α-thalassaemia"))
    assert(g.generate("A-thalassaemia") == Set.empty)
    // the reference xfails these two because its substring match lets "eta"
    // fire inside "beta"; our boundary guard produces the reference's own
    // EXPECTED sets (documented deviation)
    assert(g.generate("beta test") == Set("β test", "ϐ test", "Β test"))
    assert(g.generate("alpha beta test") == Set(
      "alpha β test", "alpha ϐ test", "alpha Β test",
      "α beta test", "α β test", "α ϐ test", "α Β test",
      "Α beta test", "Α β test", "Α ϐ test", "Α Β test"))
  }

  test("reference TokenListReplacementGenerator scenario") {
    val g = new SynonymGeneration.TokenListReplacement(Seq(
      Seq("typical", "ordinary"), Seq("abnormal", "incorrect")))
    assert(g.generate("ALT was typical") ==
      Set("ALT was ordinary", "ALT was typical"))
    assert(g.generate("ALT was abnormal") ==
      Set("ALT was incorrect", "ALT was abnormal"))
    // whole-token only: a superstring token must not be rewritten
    assert(g.generate("typical atypical") ==
      Set("typical atypical", "ordinary atypical"))
  }

  test("generators never emit empty or corrupted variants") {
    // all-stopword input: no empty synonym
    assert(SynonymGeneration.StopWordRemover.default.generate("of the").isEmpty)
    // every-group-excluded parenthetical: no empty synonym
    assert(!SynonymGeneration.SeparatorExpansion.generate("(non-protein coding)")
      .exists(_.trim.isEmpty))
    // edge-whitespace rejoin is trimmed, blank slash segments dropped
    assert(SynonymGeneration.SeparatorExpansion.generate("(pro)renin receptor") ==
      Set("renin receptor"))
    // greek suffix form respects the right word boundary (" beta" must not
    // fire inside " betaine")
    assert(SynonymGeneration.GreekSubstitution.generate("x betaine transporter").isEmpty)
    // hostile many-symbol synonym: combination growth stays bounded (the
    // reference is unbounded here — ~4^k variants for k distinct symbols)
    val hostile = "alpha beta gamma delta epsilon zeta theta iota kappa lambda x"
    val variants = SynonymGeneration.GreekSubstitution.generate(hostile)
    assert(variants.nonEmpty && variants.size <= 8192)
  }

  test("greek substitution is bidirectional") {
    assert(SynonymGeneration.GreekSubstitution.generate("TGF-β").contains("TGF-beta"))
    assert(SynonymGeneration.GreekSubstitution.generate("TGF-beta").contains("TGF-β"))
  }

  test("suffix replacement interchanges suffixes") {
    val got = SynonymGeneration.SuffixReplacement.default.generate("anaemia")
    assert(got.contains("anaemic"))
    // documented permissiveness: 'a' suffix also matches → 'anaemiic' etc.
    assert(got.contains("anaemiic"))
  }

  test("ngram hyphenation round-trips") {
    assert(SynonymGeneration.NgramHyphenation.generate("non small cell")
      .contains("non-small cell"))
    assert(SynonymGeneration.NgramHyphenation.generate("non-small cell")
      .contains("non small cell"))
  }

  test("combinatorial chains generators and excludes originals") {
    val out = SynonymGeneration.combinatorial(
      Set("the TGF-β (cytokine)"), Set("the TGF-β (cytokine)"))
    assert(out.contains("TGF-beta (cytokine)") || out.contains("the TGF-beta (cytokine)"))
    assert(!out.contains("the TGF-β (cytokine)"))
  }
}

class ExplosionMatcherSpec extends AnyFunSuite {
  import graft.ner.{ExplosionMatcher, TrieNer}
  import graft.index.Resources
  import graft.ontology.OntologyRow

  test("strict vs lowercase matchers honour per-synonym case sensitivity") {
    // autocuration marks symbolic synonyms case-sensitive: "EGFR" must
    // match only in original case; "tumour" matches any casing
    val rows = Seq(
      OntologyRow("G", "gene", "G:1", "EGFR", "EGFR", "t"),
      OntologyRow("D", "disease", "D:1", "tumour", "tumour", "t"))
    val res = Resources.build(rows,
      p => if (p == "G") "gene" else "disease", version = "expl/1")
    val hit = ExplosionMatcher.matchText(res, "EGFR causes a Tumour")
    assert(hit.map(e => (e.matchStr, e.entityClass)).toSet ==
      Set(("EGFR", "gene"), ("Tumour", "disease")))
    // linking candidates attached at match time (joint NER + linking)
    assert(hit.forall(_.candidates.nonEmpty))
    assert(hit.forall(_.candidates.forall(_.metrics.exactMatch.contains(true))))
    // lowercase "egfr" must NOT match the case-sensitive symbol
    val miss = ExplosionMatcher.matchText(res, "egfr causes a tumour")
    assert(miss.map(_.matchStr) == Seq("tumour"))
  }

  test("multi-token phrases match as token sequences") {
    val res = Resources.corpus
    val hits = ExplosionMatcher.matchText(res, "a hash join and a table scan")
    val byMatch = hits.map(e => e.matchStr -> e).toMap
    assert(byMatch.contains("hash join") && byMatch.contains("table scan"))
    assert(byMatch("hash join").candidates
      .exists(_.candidate.synonymNorm == "HASH JOIN"))
  }

  test("pipeline with explosion matcher yields identical triples to the char-trie pipeline") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    import org.apache.spark.sql.functions.expr
    val res = spark.sparkContext.broadcast(Resources.corpus)
    val pages = graft.pipeline.Pages.fromDocuments(spark, "/root/testdata/sf0.001")
      .filter(expr("cast(regexp_extract(url, '([0-9]+)$', 1) as long) < 40"))
    val (a, _) = graft.pipeline.Pipeline.run(spark, pages, res)
    val (b, _) = graft.pipeline.Pipeline.run(spark, pages, res,
      useExplosionMatcher = true)
    def key(t: graft.model.Triple) = (t.url, t.start, t.end, t.pred, t.obj, t.confidence)
    val ta = graft.triples.Triples.fromDocs(spark, a).collect().map(key).toSet
    val tb = graft.triples.Triples.fromDocs(spark, b).collect().map(key).toSet
    assert(ta.nonEmpty && ta == tb,
      s"a-only=${(ta -- tb).take(3)} b-only=${(tb -- ta).take(3)}")
  }

  test("cross-validation: explosion matcher ≡ char-trie NER on the corpus") {
    // both steps implement the same gazetteer semantics (the reference's
    // default superseded the explosion step with the char automaton); they
    // must agree entity-for-entity: spans, classes, confidences, candidates
    val res = Resources.corpus
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    try {
      val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").limit(200)
        .collect().map(_.getString(0))
      texts.foreach { t =>
        def key(e: graft.model.Mention) =
          (e.start, e.end, e.entityClass, e.mentionConfidence,
            e.candidates.map(c => (c.candidate.parserName, c.candidate.synonymNorm)).toSet)
        val trie = TrieNer.matchText(res, t).map(key).toSet
        val expl = ExplosionMatcher.matchText(res, t).map(key).toSet
        assert(trie == expl,
          s"divergence on '${t.take(80)}...': trie-only=${(trie -- expl).take(3)} expl-only=${(expl -- trie).take(3)}")
      }
    } finally () // shared session; do not stop
  }
}

class EntitySplitterSpec extends AnyFunSuite {
  private def m(text: String, s: Int, e: Int, cls: String): Mention =
    Mention(text.substring(s, e), cls, Seq(CharSpan(s, e)), "t", 50, "N")

  private val cfg = EntitySplitter.Config(
    numericalClasses = Set("gene"), conjunctionClasses = Set("disease"))

  test("numerical list: HER2/3 → HER2 + HER3 (exact reference semantics)") {
    val text = "HER2/3 amplified"
    val out = EntitySplitter.splitNumericalList(m(text, 0, 6, "gene"), text)
    assert(out.map(_.matchStr) == Seq("HER2", "HER3"))
    val her3 = out(1)
    assert(her3.spans == Seq(CharSpan(0, 3), CharSpan(5, 6)))
    assert(!her3.isContiguous && out.head.isContiguous)
  }

  test("conjunction: lung and liver cancer → liver cancer + lung cancer") {
    val text = "lung and liver cancer"
    val out = EntitySplitter.splitConjunction(m(text, 0, 21, "disease"), text)
    assert(out.map(_.matchStr) == Seq("liver cancer", "lung cancer"))
    assert(out(1).spans == Seq(CharSpan(0, 4), CharSpan(15, 21)))
  }

  test("no split on plain mentions") {
    val text = "breast cancer"
    assert(EntitySplitter.split(cfg)(m(text, 0, 13, "disease"), text).isEmpty)
  }

  test("reference fixture table: every row passes (no divergences remain)") {
    // entity_splitter_cases.tsv ports the reference's own test inputs
    // (test_entity_post_processing.py) plus structurally re-derived
    // base-NP coordination shapes (round 7) — every row is executed and
    // asserted against its recorded expectation
    val lines = scala.io.Source.fromFile(
      "src/test/resources/entity_splitter_cases.tsv")("UTF-8")
      .getLines().drop(1).filter(_.nonEmpty).toSeq
    assert(lines.size >= 5)
    var passCount = 0
    lines.foreach { line =>
      val cols = line.split("\t")
      val (rule, cls, text) = (cols(1), cols(2), cols(3))
      val (s, e) = (cols(4).toInt, cols(5).toInt)
      val status = cols(7)
      val ent = m(text, s, e, cls)
      val got = EntitySplitter.split(cfg)(ent, text).map(_.matchStr).toSet
      if (cols(6) == "(none)") {
        // anchor-None rows: the reference emits NOTHING — so must we
        assert(got.isEmpty, s"${cols(0)} [$status]: expected no split, got $got")
      } else {
        val expected = cols(6).split("\\|").toSet
        assert(expected.subsetOf(got + ent.matchStr),
          s"${cols(0)} [$status]: expected $expected ⊄ $got")
      }
      got.foreach { g =>
        val sp = EntitySplitter.split(cfg)(ent, text).find(_.matchStr == g).get.spans
        sp.foreach(cs => assert(text.substring(cs.start, cs.end).nonEmpty))
      }
      if (status == "pass") passCount += 1
    }
    assert(passCount >= 7, "every fixture row must pass (no recorded divergences remain)")
  }

  test("splitter is reachable from Pipeline.run via config") {
    // wiring check without Spark: the fused per-partition chain applies the
    // splitter after NER when configured
    val res = graft.index.Resources.corpus
    val doc = KDoc("u", new java.sql.Timestamp(0),
      "the XQ1/2 thing", "en",
      Seq(Section("body", "the XQ1/2 thing",
        Seq(m("the XQ1/2 thing", 4, 9, "operator")))))
    val out = graft.pipeline.Pipeline.fusedStages(res,
      graft.link.Ladders.default, graft.link.ClassFilter.Rules(),
      withTransformerNer = false,
      splitter = EntitySplitter.Config(numericalClasses = Set("operator")))(
      Iterator(doc)).next()
    val matches = out.entities.map(_.matchStr)
    assert(matches.contains("XQ2"), matches)
  }
}

class XrefSpec extends AnyFunSuite {
  test("xref expansion adds mappings in target ontologies") {
    val xm = Xref.XrefMap(Map(
      ("MONDO", "MONDO:1") -> Seq(
        Xref.XrefTarget("MEDDRA_DB", "MEDDRA", "M123", "breast cancer"))))
    val base = Mapping("breast cancer", "MONDO", "DIS_DB", "MONDO:1",
      "s", "HIGHLY_LIKELY", None, None)
    val e = Mention("breast cancer", "disease", Seq(CharSpan(0, 13)), "t", 50,
      "BREAST CANCER", mappings = Seq(base))
    val d = Xref.processDoc(xm)(KDoc("u", new java.sql.Timestamp(0), "x", "en",
      Seq(Section("s", "x", Seq(e)))))
    val mappings = d.entities.head.mappings
    assert(mappings.size == 2)
    assert(mappings.exists(m => m.source == "MEDDRA" && m.idx == "M123"))
  }
}

class EmbeddingLinkingSpec extends AnyFunSuite {
  private val rows = Seq(
    OntologyRow("DB", "disease", "D:1", "influenza", "influenza", "exact"),
    OntologyRow("DB", "disease", "D:2", "measles", "measles", "exact"))
  private val res = Resources.build(rows, _ => "disease", version = "embtest/1")

  test("attaches nearest-synonym candidates by embedding cosine") {
    val e = Mention("influenzas", "disease", Seq(CharSpan(0, 10)), "ModelNer",
      50, "INFLUENZA") // matchNorm (depluralized) == syn_norm → but assume
    val d = KDoc("u", new java.sql.Timestamp(0), "influenzas", "en",
      Seq(Section("s", "influenzas", Seq(e))))
    val out = EmbeddingLinking.processPartition(res)(Iterator(d)).next()
    val cands = out.entities.head.candidates
    assert(cands.nonEmpty)
    assert(cands.head.candidate.synonymNorm == "INFLUENZA")
    assert(cands.head.metrics.embedScore.exists(_ >= 0.7))
  }

  test("leaves entities with existing candidates untouched") {
    val cand = CandidateWithMetrics(
      LinkingCandidate("DB", "MEASLES", Seq("measles"), false, Seq("exact"),
        Seq(EquivalentIdSet(Seq(IdAndSource("D:2", "D")))), "UNAMBIGUOUS"),
      LinkingMetrics(exactMatch = Some(true)))
    val e = Mention("measles", "disease", Seq(CharSpan(0, 7)), "TrieNer", 50,
      "MEASLES", candidates = Seq(cand))
    val d = KDoc("u", new java.sql.Timestamp(0), "measles", "en",
      Seq(Section("s", "measles", Seq(e))))
    val out = EmbeddingLinking.processPartition(res)(Iterator(d)).next()
    assert(out.entities.head.candidates == Seq(cand))
  }
}

class CurationSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.ontology._

  test("global actions drop ids via anti-join semantics") {
    val rows = CorpusOntology.rows
    val kept = Curation.applyGlobalActions(rows,
      Map("OPS" -> Set("OP:SORT")))
    assert(!kept.exists(_.idx == "OP:SORT"))
    assert(kept.exists(_.idx == "OP:FILTER"))
  }

  test("curation overrides replace defaults; conflicts resolved deterministically") {
    val defaults = Seq(StringResource("P", "disease", "FLU",
      Seq(SynonymSpec("flu", caseSensitive = false, MentionConfidence.Probable)),
      Behaviour.AddForNerAndLinking))
    val overrides = Seq(
      StringResource("P", "disease", "FLU",
        Seq(SynonymSpec("flu", caseSensitive = true, MentionConfidence.Possible)),
        Behaviour.AddForNerAndLinking),
      StringResource("P", "disease", "FLU",
        Seq(SynonymSpec("flu", caseSensitive = false, MentionConfidence.HighlyLikely)),
        Behaviour.AddForNerAndLinking),
      StringResource("P", "disease", "NEWSYN",
        Seq(SynonymSpec("newsyn", caseSensitive = false, MentionConfidence.Probable)),
        Behaviour.AddForLinkingOnly))
    val (merged, conflicts) = Curation.applyCurations(defaults, overrides)
    assert(conflicts.size == 1)
    val flu = merged.find(_.synNorm == "FLU").get
    // ci wins, max confidence wins
    assert(flu.synonyms == Seq(SynonymSpec("flu", caseSensitive = false,
      MentionConfidence.HighlyLikely)))
    // novel curation appended; linking-only → no NER synonyms
    val newsyn = merged.find(_.synNorm == "NEWSYN").get
    assert(newsyn.activeNerSynonyms.isEmpty)
  }

  test("DROP_FOR_LINKING wins conflicts") {
    val overrides = Seq(
      StringResource("P", "disease", "X",
        Seq(SynonymSpec("x", false, 50)), Behaviour.AddForNerAndLinking),
      StringResource("P", "disease", "X",
        Seq(SynonymSpec("x", false, 50)), Behaviour.DropForLinking))
    val (merged, _) = Curation.applyCurations(Seq.empty, overrides)
    assert(merged.head.behaviour == Behaviour.DropForLinking)
  }
}
