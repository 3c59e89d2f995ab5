package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.SpacyNer
import graft.text.Tokenizer

/** Property fuzz for the C8 stand-in pipeline (the AhoCorasickSpec
  * technique): [[SpacyNer.RulerPipeline]]'s keyed-scan + filter_spans must
  * equal a NAIVE quadratic re-derivation — brute-force every
  * (pattern, token position) candidate, then the spaCy filter_spans rule
  * (length desc, start asc, greedy keep over unseen tokens) re-implemented
  * directly — over random vocab/text draws. Sentence spans get the
  * structural invariants (token-aligned, ordered, non-overlapping,
  * whitespace-free).
  */
class RulerFuzzSpec extends AnyFunSuite {

  private val words = Vector("aa", "bb", "cc", "dd", "ee")

  private def randomText(r: scala.util.Random): String = {
    val n = 1 + r.nextInt(40)
    (1 to n).map { _ =>
      val w = words(r.nextInt(words.length))
      if (r.nextInt(8) == 0) w + "." else w
    }.mkString(" ")
  }

  private def randomPatterns(r: scala.util.Random): Map[String, String] = {
    val n = 1 + r.nextInt(6)
    (1 to n).map { _ =>
      val len = 1 + r.nextInt(3)
      val phrase = (1 to len).map(_ => words(r.nextInt(words.length))).mkString(" ")
      phrase -> s"LBL_${phrase.hashCode.abs % 7}"
    }.toMap // Map dedups identical phrases; distinct phrases here always
    // tokenize distinctly (single-space joins of plain words)
  }

  /** Brute-force candidates + direct filter_spans, independent of the
    * keyed-scan implementation. */
  private def naive(text: String, patterns: Map[String, String]): Seq[(Int, Int, String)] = {
    val toks = Tokenizer.tokenize(text)
    val tokWords = toks.map(t => text.substring(t.start, t.end)).toSeq
    val compiled = patterns.toSeq.sortBy(_._1).map { case (p, l) =>
      (Tokenizer.tokenize(p).map(t => p.substring(t.start, t.end)).toSeq, l)
    }.filter(_._1.nonEmpty)
    val cands = for {
      i <- tokWords.indices
      (ph, l) <- compiled
      if i + ph.length <= tokWords.length && tokWords.slice(i, i + ph.length) == ph
    } yield (i, i + ph.length, l)
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    val seen = scala.collection.mutable.Set.empty[Int]
    cands.sortBy { case (s, e, _) => (-(e - s), s) }.foreach { case (s, e, l) =>
      if (!(s until e).exists(seen)) { kept += ((s, e, l)); seen ++= (s until e) }
    }
    kept.sortBy(_._1).toSeq
      .map { case (s, e, l) => (toks(s).start, toks(e - 1).end, l) }
  }

  test("800 random draws: keyed-scan pipeline ≡ brute-force filter_spans") {
    val r = new scala.util.Random(0xc8c8)
    for (i <- 1 to 800) {
      val text = randomText(r)
      val patterns = randomPatterns(r)
      val got = new SpacyNer.RulerPipeline(patterns).processSingle(text).ents
      val want = naive(text, patterns)
      assert(got == want, s"draw $i text='$text' patterns=$patterns")
    }
  }

  test("sentence spans: token-aligned, ordered, non-overlapping, no edge whitespace") {
    val r = new scala.util.Random(0x5e45)
    val pipeline = new SpacyNer.RulerPipeline(Map("aa" -> "A"))
    for (_ <- 1 to 300) {
      val text = randomText(r)
      val sents = pipeline.processSingle(text).sents
      val bounds = Tokenizer.tokenize(text)
        .flatMap(t => Seq(t.start, t.end)).toSet
      var prevEnd = -1
      sents.foreach { case (s, e) =>
        assert(s < e && s >= 0 && e <= text.length)
        assert(bounds(s) && bounds(e), s"($s,$e) not token-aligned in '$text'")
        assert(!text.charAt(s).isWhitespace && !text.charAt(e - 1).isWhitespace)
        assert(s >= prevEnd, s"overlap/disorder at ($s,$e) in '$text'")
        prevEnd = e
      }
    }
  }
}
