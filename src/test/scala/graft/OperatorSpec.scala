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

  test("stopword removal trims edges only") {
    val g = SynonymGeneration.StopWordRemover.default
    assert(g.generate("the breast cancer") == Set("breast cancer"))
    // interior stopwords are untouched
    assert(g.generate("cancer of the breast").isEmpty)
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

class EntitySplitterSpec extends AnyFunSuite {
  private def m(text: String, s: Int, e: Int, cls: String): Mention =
    Mention(text.substring(s, e), cls, Seq(CharSpan(s, e)), "t", 50, "N")

  test("numerical list: HER2/3 → HER3 non-contiguous") {
    val text = "HER2/3 amplified"
    val out = EntitySplitter.splitNumericalList(m(text, 0, 6, "gene"), text)
    assert(out.size == 1)
    val her3 = out.head
    assert(her3.matchStr == "HER3")
    assert(her3.spans == Seq(CharSpan(0, 3), CharSpan(5, 6)))
    assert(!her3.isContiguous)
  }

  test("conjunction: lung and liver cancer → lung cancer") {
    val text = "lung and liver cancer"
    val out = EntitySplitter.splitConjunction(m(text, 0, 21, "disease"), text)
    assert(out.size == 1)
    assert(out.head.matchStr == "lung cancer")
    assert(out.head.spans == Seq(CharSpan(0, 4), CharSpan(15, 21)))
  }

  test("no split on plain mentions") {
    val text = "breast cancer"
    assert(EntitySplitter.split(m(text, 0, 13, "disease"), text).isEmpty)
  }
}

class XrefSpec extends AnyFunSuite {
  test("xref expansion adds mappings in target ontologies") {
    val xm = Xref.XrefMap(Map(
      ("DIS_DB", "MONDO:1") -> Seq(
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
