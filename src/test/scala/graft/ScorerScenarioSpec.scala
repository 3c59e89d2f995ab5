package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Normalizer, Similarity}

/** Port of the reference's scorer scenario suite
  * (kazu/tests/test_string_similarity_scorers.py:15-77): each boolean
  * scorer is driven exactly as in the pipeline — on NORMALIZED terms,
  * reference side = normalize(entity match), query side = the candidate's
  * synonym_norm (normalize of its FIRST raw synonym) — so this pins the
  * scorer ∘ normalizer SYSTEM behavior, not the scorer in isolation.
  */
class ScorerScenarioSpec extends AnyFunSuite {

  // the reference calls StringNormalizer.normalize(x) with no entity class
  private def norm(s: String): String = Normalizer.normalize(s, "")

  test("EntitySubtype: 'diabetes, type 2' accepts type-2 synonyms, rejects type-1") {
    val ref = norm("diabetes, type 2")
    for (syn <- Seq("type II diabetes", "type 2 diabetes"))
      assert(Similarity.EntitySubtype.matches(ref, norm(syn)), syn)
    for (syn <- Seq("type I diabetes", "type 1 diabetes"))
      assert(!Similarity.EntitySubtype.matches(ref, norm(syn)), syn)
  }

  test("EntitySubtype: the reference's own xfail — non-TYPE numeric suffixes " +
    "(PPP1R 14C vs 14D) are NOT distinguished (pinned shared limitation)") {
    // reference marks this param xfail("inappropriate string normalisation"):
    // no "TYPE n" phrase exists on either side, so both compares are
    // vacuously true and the not-matching assertion fails there exactly as
    // it would here. Pin the parity of the limitation.
    val ref = norm("PPP1R 14C")
    assert(Similarity.EntitySubtype.matches(ref,
      norm("protein phosphatase 1 regulatory inhibitor subunit 14C")))
    assert(Similarity.EntitySubtype.matches(ref,
      norm("protein phosphatase 1 regulatory inhibitor subunit 14D")))
  }

  test("NumberMatch: MAP1LC3A gene matches MAP1LC3A, not MAP2LC3A") {
    val ref = norm("MAP1LC3A gene")
    assert(Similarity.NumberMatch.matches(ref, norm("MAP1LC3A")))
    assert(!Similarity.NumberMatch.matches(ref, norm("MAP2LC3A")))
  }

  test("EntityNounModifier: LIKE / PSEUDOGENE / RECEPTOR scenarios") {
    val like = new Similarity.EntityNounModifier(Seq("LIKE"))
    assert(like.matches(norm("CPI17 like"), norm("CPI17-like")))
    assert(!like.matches(norm("CPI17 like"), norm("CPI17")))

    val pseudo = new Similarity.EntityNounModifier(Seq("PSEUDOGENE"))
    assert(pseudo.matches(norm("CPI17"), norm("CPI17")))
    assert(!pseudo.matches(norm("CPI17"), norm("CPI17 pseudogene")))

    val receptor = new Similarity.EntityNounModifier(Seq("RECEPTOR"))
    assert(receptor.matches(norm("EGF receptor"),
      norm("epidermal growth factor receptor")))
    assert(!receptor.matches(norm("EGF receptor"),
      norm("epidermal growth factor")))
  }

  test("RapidFuzz scorer: 'bowels cancer' scores positive against the " +
    "bowel-cancer candidate") {
    assert(Similarity.Fuzzy.score(norm("bowels cancer"), norm("bowel cancer")) > 0.0)
  }
}
