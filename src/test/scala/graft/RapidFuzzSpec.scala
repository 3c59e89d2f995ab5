package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Similarity._

/** Faithful port of the rapidfuzz scorer family used by the reference
  * (string_similarity_scorers.py:81-92): ratio (normalized indel),
  * token_sort/token_set/token ratio, partial variants, and the WRatio
  * weighting ladder (scales 0.95 / 0.9 / 0.6 at the documented length-ratio
  * breakpoints). No rapidfuzz wheel exists in this sandbox, so fixtures are
  * hand-computed from the published algorithm (rapidfuzz fuzz_py, MIT).
  */
class RapidFuzzSpec extends AnyFunSuite {

  test("ratio: normalized indel similarity") {
    assert(ratio("this is a test", "this is a test!") === 100.0 * (1 - 1.0 / 29))
    assert(ratio("", "") == 100.0)
    assert(ratio("abc", "") == 0.0)
    assert(ratio("kitten", "kitten") == 100.0)
  }

  test("token_sort_ratio: word order is free") {
    assert(tokenSortRatio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 100.0)
    // python str.split() semantics: leading/trailing/repeated whitespace
    assert(tokenSortRatio("  a   b ", "b a") == 100.0)
  }

  test("token_set_ratio: duplicate tokens collapse; subset scores 100") {
    assert(tokenSetRatio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0)
    assert(tokenSetRatio("a b", "a b c") == 100.0) // one diff empty
    // hand-computed: sect="a b"(3), diffs "c"/"d" → result 100−100·2/10=80,
    // sect ratios 75 → max 80
    assert(tokenSetRatio("a b c", "a b d") == 80.0)
    assert(tokenSetRatio("", "x") == 0.0)
  }

  test("partial_ratio: best window of the longer string") {
    assert(partialRatio("this is a test", "xx this is a test xx") == 100.0)
    // best alignment is the truncated suffix window "bcd": ratio("abcd",
    // "bcd") = 100·(1 − 1/7) — boundary windows beat the full-string 75
    assert(partialRatio("abcd", "xbcd") == 100.0 * (1.0 - 1.0 / 7))
    assert(partialRatio("t", "tttttttttt") == 100.0)
    assert(partialRatio("", "") == 100.0)
    assert(partialRatio("", "abc") == 0.0)
  }

  test("WRatio: similar lengths use token_ratio · 0.95") {
    // ratio = 87.5, token_set = 100 (subset) → 0.95·100 = 95
    assert(wRatio("this is a test", "this is a new test") == 95.0)
    // identical → 100 via plain ratio
    assert(wRatio("same", "same") == 100.0)
    assert(wRatio("", "x") == 0.0)
  }

  test("WRatio: very different lengths use partial · scale") {
    // lenRatio 10 ≥ 8 → partial scale 0.6: partial_ratio = 100 → 60
    assert(wRatio("t", "tttttttttt") == 60.0)
    // lenRatio 2 (< 8) → scale 0.9: partial 100 → 90
    assert(wRatio("test", "test xxxx") == 90.0)
  }

  test("reference dispatch: long multi-token → token_sort, else WRatio") {
    // >10 chars and >4 tokens → token_sort_ratio
    val longRef = "a b c d e f g h"
    assert(Fuzzy.score(longRef, "h g f e d c b a") == 100.0)
    // short → WRatio
    assert(Fuzzy.score("this is a test", "this is a new test") == 95.0)
  }

  test("properties: symmetry-of-range, bounds, monotone identity") {
    val samples = Seq("", "a", "ab ba", "the quick brown fox", "MAP K8",
      "type II diabetes", "xxxxxx", "a b c d e f")
    for (x <- samples; y <- samples) {
      val w = wRatio(x, y)
      assert(w >= 0.0 && w <= 100.0, s"($x, $y) → $w")
      assert(ratio(x, y) == ratio(y, x))
      assert(tokenSetRatio(x, y) == tokenSetRatio(y, x))
    }
    samples.filter(_.nonEmpty).foreach(x => assert(wRatio(x, x) == 100.0))
  }
}
