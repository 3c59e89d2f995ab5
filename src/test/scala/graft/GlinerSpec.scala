package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ner.Gliner

/** C6: the GLiNER harness — sentence batching, label-shuffle iterations,
  * cross-prediction conflict resolution (majority vote / max score) and
  * Aho-Corasick re-propagation of winning matches — replayed over scripted
  * backbones so the module's documented conflict semantics
  * (ref kazu/steps/ner/gliner.py:38-319) are pinned independently of any
  * trained model, plus a MiniBern-backbone end-to-end smoke.
  */
class GlinerSpec extends AnyFunSuite {

  private def doc(text: String): KDoc = KDoc(
    url = "https://graft.test/doc/g0",
    warcTs = new java.sql.Timestamp(0L),
    text = text, lang = "en",
    sections = Seq(Section("body", text,
      sentenceSpans = graft.text.Tokenizer.sentenceSpans(text))))

  private val prompts = Map("operator" -> "operator", "component" -> "component")

  /** Scripted backbone: emits exactly the given (surfaceForm → (class,
    * score)) predictions for each occurrence of the surface in the batch
    * sentence, honouring the threshold like the real model API. */
  private final class Scripted(preds: Seq[(String, String, Double)]) extends Gliner.Backbone {
    def predict(sentence: String, labels: Seq[String], threshold: Double): Seq[Gliner.Pred] =
      preds.flatMap { case (surface, cls, score) =>
        if (score < threshold) Seq.empty
        else {
          var out = List.empty[Gliner.Pred]
          var i = sentence.indexOf(surface)
          while (i >= 0) {
            out ::= Gliner.Pred(i, i + surface.length, surface, cls, score)
            i = sentence.indexOf(surface, i + 1)
          }
          out.reverse
        }
      }
  }

  test("majority vote wins per match string; winners re-propagate to unpredicted occurrences") {
    // "spark" predicted component on two occurrences (sentence 1) and
    // operator on one (sentence 2); sentence 3's occurrence is never
    // predicted at all. Majority → component; re-propagation must tag ALL
    // FOUR boundary-valid occurrences, including the unpredicted one —
    // and must NOT fire inside "sparkle".
    val text = "spark meets spark today. operators like spark. " +
      "a fresh spark arrives. sparkle is different."
    final class SentenceAware extends Gliner.Backbone {
      def predict(s: String, labels: Seq[String], threshold: Double): Seq[Gliner.Pred] = {
        val base =
          if (s.contains("meets")) new Scripted(Seq(("spark", "component", 0.9)))
          else if (s.contains("operators")) new Scripted(Seq(("spark", "operator", 0.8)))
          else new Scripted(Seq.empty)
        base.predict(s, labels, threshold)
      }
    }
    // cap 6 < any sentence's token count + next: every batch is exactly
    // one sentence, so the sentence-aware scripted backbone sees them
    // separately
    val cfg = Gliner.Config(prompts, maxContextSize = 6,
      scorer = () => new Gliner.MajorityVoteScorer)
    val out = Gliner.processBatch(cfg, new SentenceAware)(Seq(doc(text)))
    val ents = out.head.sections.head.entities
    assert(ents.nonEmpty)
    assert(ents.forall(_.namespace == Gliner.Namespace))
    val sparkEnts = ents.filter(_.matchStr == "spark")
    // all four standalone occurrences, none inside "sparkle"
    assert(sparkEnts.size == 4, sparkEnts.map(e => (e.start, e.end)))
    assert(sparkEnts.forall(_.entityClass == "component"),
      sparkEnts.map(_.entityClass))
    val sparkleStart = text.indexOf("sparkle")
    assert(!ents.exists(e => e.start == sparkleStart && e.end == sparkleStart + 5))
  }

  test("max-score scorer: the highest scoring class wins regardless of vote count") {
    val text = "spark meets spark today. operators like spark. a fresh spark arrives."
    final class SentenceAware extends Gliner.Backbone {
      def predict(s: String, labels: Seq[String], threshold: Double): Seq[Gliner.Pred] = {
        val base =
          if (s.contains("meets")) new Scripted(Seq(("spark", "component", 0.9)))
          else if (s.contains("operators")) new Scripted(Seq(("spark", "operator", 0.95)))
          else new Scripted(Seq.empty)
        base.predict(s, labels, threshold)
      }
    }
    val cfg = Gliner.Config(prompts, maxContextSize = 6,
      scorer = () => new Gliner.MaxScoreScorer)
    val out = Gliner.processBatch(cfg, new SentenceAware)(Seq(doc(text)))
    val sparkEnts = out.head.sections.head.entities.filter(_.matchStr == "spark")
    assert(sparkEnts.size == 4)
    assert(sparkEnts.forall(_.entityClass == "operator"))
  }

  test("threshold 0.3 config parity: sub-threshold predictions never reach the scorer") {
    val text = "spark arrives."
    val cfg = Gliner.Config(prompts) // threshold = 0.3, ref default
    val out = Gliner.processBatch(cfg,
      new Scripted(Seq(("spark", "component", 0.29))))(Seq(doc(text)))
    assert(out.head.sections.head.entities.isEmpty)
    val out2 = Gliner.processBatch(cfg,
      new Scripted(Seq(("spark", "component", 0.31))))(Seq(doc(text)))
    assert(out2.head.sections.head.entities.nonEmpty)
  }

  test("sentence batching: whole sentences only, packed under the token cap") {
    // 4 sentences × 4 tokens each; cap 9 → batches of 2 sentences
    val text = "one two three four. five six seven eight. " +
      "nine ten eleven twelve. alpha beta gamma delta."
    val spans = graft.text.Tokenizer.sentenceSpans(text)
    assert(spans.size == 4)
    val batches = Gliner.sectionBatches(text, spans, maxContextSize = 9)
    // every batch boundary coincides with sentence boundaries
    val startSet = spans.map(_.start).toSet
    val endSet = spans.map(_.end).toSet
    batches.foreach { case (s, e) =>
      assert(startSet.contains(s) && endSet.contains(e), (s, e))
    }
    // full coverage, in order, no sentence split
    assert(batches.head._1 == spans.head.start)
    assert(batches.last._2 == spans.last.end)
    assert(batches.size >= 2, batches)
  }

  test("label shuffles are deterministic and distinct") {
    val a = Gliner.labelSets(Seq("x", "y", "z"), 5)
    val b = Gliner.labelSets(Seq("z", "y", "x"), 5)
    assert(a == b) // order-insensitive input, deterministic output
    assert(a.distinct.size == a.size)
    assert(a.forall(_.sorted == Seq("x", "y", "z")))
    assert(a.size == 5)
    // can't demand more orderings than permutations exist
    assert(Gliner.labelSets(Seq("x", "y"), 5).size == 2)
  }

  test("MiniBern backbone end-to-end: transformer-vocab words propagate with their class") {
    // "window"/"sort" are operator vocab, "stream" component vocab for the
    // MiniBern prototype head; the harness should tag every boundary-valid
    // occurrence, including ones in sentences the backbone saw separately
    val text = "the window slides. a stream flows. window again closes."
    val cfg = Gliner.Config(prompts, scorer = () => new Gliner.MaxScoreScorer)
    val out = Gliner.processPartition(cfg)(Iterator(doc(text))).toSeq
    val ents = out.head.sections.head.entities
    val windows = ents.filter(_.matchStr == "window")
    assert(windows.size == 2, ents.map(e => (e.matchStr, e.entityClass)))
    assert(windows.forall(_.entityClass == "operator"))
    assert(ents.exists(e => e.matchStr == "stream" && e.entityClass == "component"))
  }
}
