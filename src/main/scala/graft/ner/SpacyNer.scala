package graft.ner

import graft.model._
import graft.text.Normalizer

/** Generic spaCy-pipeline NER step plane — SURVEY.md §2.C8
  * (ref kazu/steps/ner/spacy_ner.py:6-41).
  *
  * The reference step runs an arbitrary user-supplied spaCy pipeline over
  * each section and expects the resulting doc to carry `doc.ents` (and
  * `doc.sents` when `add_sentence_spans`). Its per-entity semantics, all
  * pinned here and in SpacyNerSpec:
  *
  *  - **APPEND, never replace** (spacy_ner.py:28-37): recognized entities
  *    are appended to `section.entities`; whatever earlier steps produced
  *    stays untouched.
  *  - **Label lowercased** (spacy_ner.py:34): `entity_class =
  *    ent.label_.lower()` — spaCy models emit upper-case labels.
  *  - `match` is the literal text slice, spans contiguous, namespace is the
  *    step's, confidence the Entity default HIGHLY_LIKELY
  *    (kazu/data/__init__.py:283), `match_norm` recomputed for the
  *    lowercased class (Entity.__post_init__, data/__init__.py:322-324).
  *  - **Sentence spans** (spacy_ner.py:38-41): when `add_sentence_spans`,
  *    `section.sentence_spans = [CharSpan(sent.start_char, sent.end_char)]`
  *    — spaCy sentence spans are token-derived (first-token start to
  *    last-token end; inter-token trailing whitespace is `.whitespace_`,
  *    not a token), and the kazu setter is write-once AND duplicate-free
  *    (data/__init__.py:466-481) so a violation routes the document to
  *    the failure path.
  *  - **Partial work survives a failure**: the reference mutates the doc
  *    in place, so when the setter raises mid-document, earlier sections
  *    keep their appended entities/spans and the raising section keeps the
  *    entities appended BEFORE the setter ran (entity append precedes the
  *    span assignment, spacy_ner.py:28-41). The failed-docs dump must show
  *    that partially-processed state, not the pristine input.
  *
  * The spaCy runtime is environment-blocked (zero egress, no model
  * packages), so the pipeline sits behind the pluggable
  * [[SpacyLikePipeline]] slot exactly as C6/C7/C9/C10 are built.
  * [[RulerPipeline]] is the first-party stand-in: spaCy's own
  * `EntityRuler + sentencizer` recipe (the documented way to assemble a
  * rule-based spaCy NER pipeline) re-implemented over the repo's
  * deterministic tokenizer — exact token-boundary phrase matching with
  * `spacy.util.filter_spans` overlap resolution (longest span wins, ties
  * to the earlier start), which is how EntityRuler reconciles overlapping
  * matches into the non-overlapping `doc.ents`. Divergence from a TRAINED
  * spaCy statistical model is model-dependent only, same boundary as
  * C2/C6/D3.
  *
  * Scale shape: one narrow mapPartitions over the doc stream — the pipeline
  * is executor-pinned (the reference holds one spaCy pipeline per worker
  * via its SpacyPipelines registry), per-document work is O(section
  * length + matches log matches), nothing shuffles.
  */
object SpacyNer {

  val Namespace = "SpacyNerStep"

  /** One pipeline invocation's result (the fields of a processed spaCy
    * doc the step reads): `ents` as (start_char, end_char, label_) and
    * `sents` as (start_char, end_char). */
  final case class SpacyDoc(ents: Seq[(Int, Int, String)], sents: Seq[(Int, Int)])

  /** The pipeline slot (ref SpacyPipelines.process_single,
    * kazu/utils/spacy_pipeline.py). */
  trait SpacyLikePipeline extends Serializable {
    def processSingle(text: String): SpacyDoc
  }

  /** First-party stand-in: EntityRuler phrase patterns + sentencizer.
    * Matching is the PhraseMatcher contract — every pattern × every
    * token-boundary position is a candidate — and overlaps resolve via
    * spaCy `util.filter_spans`: longest span first, ties to the earlier
    * start, greedy keep over unseen tokens, result in document order.
    * Two DISTINCT phrases tokenizing to the identical sequence tie-break
    * on the lexicographically smaller phrase (spaCy would keep whichever
    * pattern the matcher yielded first — an insertion-order accident; a
    * canonical sort keeps this plane deterministic). Sentence spans are
    * token-derived, as spaCy's are. */
  final class RulerPipeline(patterns: Map[String, String]) extends SpacyLikePipeline {
    // each phrase tokenized once at construction (PhraseMatcher compiles
    // patterns up front); keyed by first token text for O(tokens) scans;
    // canonical (phrase-sorted) order within a key for determinism
    private val compiled: Map[String, Seq[(Array[String], String)]] =
      patterns.toSeq.sortBy(_._1).map { case (phrase, label) =>
        val toks = graft.text.Tokenizer.tokenize(phrase)
          .map(t => phrase.substring(t.start, t.end))
        (toks, label)
      }.filter(_._1.nonEmpty)
        .groupBy(_._1.head)

    def processSingle(text: String): SpacyDoc = {
      val toks = graft.text.Tokenizer.tokenize(text)
      val words = toks.map(t => text.substring(t.start, t.end))
      // all candidate matches: (tokenStart, tokenEndExcl, label)
      val cands = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      var i = 0
      while (i < toks.length) {
        compiled.getOrElse(words(i), Nil).foreach { case (ph, label) =>
          if (ph.indices.forall(j => i + j < toks.length && words(i + j) == ph(j)))
            cands += ((i, i + ph.length, label))
        }
        i += 1
      }
      // util.filter_spans: sort (length desc, start asc) — the canonical
      // compile order above already fixed equal-(length,start) ties —
      // then greedily keep spans over not-yet-seen tokens
      val seen = new java.util.BitSet(toks.length)
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      cands.sortBy { case (s, e, _) => (-(e - s), s) }.foreach { case (s, e, label) =>
        val free = seen.nextSetBit(s) match { case b => b < 0 || b >= e }
        if (free) {
          kept += ((s, e, label))
          seen.set(s, e)
        }
      }
      val ents = kept.sortBy(_._1)
        .map { case (s, e, label) => (toks(s).start, toks(e - 1).end, label) }
      SpacyDoc(ents.toSeq, tokenDerivedSents(text, toks))
    }
  }

  /** Token-derived sentence spans: one forward cursor over the (sorted)
    * token array per sentence boundary — O(tokens), not O(sentences ×
    * tokens); tokens never straddle a boundary (boundaries fall on
    * whitespace). Sentences without tokens are dropped (spaCy sents always
    * contain at least one token). Shared by the C8 stand-in and C10's
    * [[StanzaSentencer.MiniGeniaPipeline]]. */
  private[ner] def tokenDerivedSents(
      text: String,
      toks: Array[graft.text.Tokenizer.Token]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    graft.text.Tokenizer.sentenceSpans(text).foreach { s =>
      while (i < toks.length && toks(i).start < s.start) i += 1
      val first = i
      while (i < toks.length && toks(i).end <= s.end) i += 1
      if (i > first) out += ((toks(first).start, toks(i - 1).end))
    }
    out.toSeq
  }

  final case class Config(addSentenceSpans: Boolean = true)

  /** Carries the partially-processed section out of a mid-document
    * failure, so the failed doc reflects the reference's in-place
    * mutation state. */
  private final class SectionFailure(val partial: Section, msg: String)
      extends RuntimeException(msg)

  /** One document through the step (spacy_ner.py __call__:24-41). */
  def processDoc(pipeline: SpacyLikePipeline, cfg: Config = Config())(doc: KDoc): KDoc = {
    val done = scala.collection.mutable.ArrayBuffer.empty[Section]
    try {
      doc.sections.foreach { sec =>
        val spacyDoc = pipeline.processSingle(sec.text)
        val appended = spacyDoc.ents.map { case (s, e, label) =>
          val cls = label.toLowerCase(java.util.Locale.ROOT)
          val m = sec.text.substring(s, e)
          Mention(
            matchStr = m,
            entityClass = cls,
            spans = Seq(CharSpan(s, e)),
            namespace = Namespace,
            mentionConfidence = MentionConfidence.HighlyLikely,
            matchNorm = Normalizer.normalize(m, cls))
        }
        // entity append precedes the span assignment (spacy_ner.py:28-41),
        // so a setter failure keeps the appended entities
        val withEnts = sec.copy(entities = sec.entities ++ appended)
        done += (if (!cfg.addSentenceSpans) withEnts
        else {
          if (sec.sentenceSpans.nonEmpty)
            throw new SectionFailure(withEnts,
              "Immutable sentence_spans is already set")
          val spans = spacyDoc.sents.map { case (s, e) => CharSpan(s, e) }
          if (spans.distinct != spans)
            throw new SectionFailure(withEnts,
              "There are duplicate sentence spans")
          withEnts.copy(sentenceSpans = spans)
        })
      }
      doc.copy(sections = done.toSeq)
    } catch {
      case e: SectionFailure =>
        val rest = doc.sections.drop(done.length + 1)
        doc.copy(
          sections = (done += e.partial).toSeq ++ rest,
          error = Some(s"$Namespace: ${e.getMessage}"))
      case e: Exception =>
        doc.copy(
          sections = done.toSeq ++ doc.sections.drop(done.length),
          // message-less exceptions (bare NPEs from a user pipeline) would
          // dump an undiagnosable "null" — fall back to class+message
          error = Some(s"$Namespace: ${Option(e.getMessage).getOrElse(e.toString)}"))
    }
  }

  /** Dataset plane: one narrow mapPartitions, pipeline instantiated once
    * per partition. */
  def annotate(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.Dataset[KDoc],
      pipelineFactory: () => SpacyLikePipeline,
      cfg: Config = Config()
  ): org.apache.spark.sql.Dataset[KDoc] = {
    import spark.implicits._
    docs.mapPartitions { it =>
      val pipe = pipelineFactory()
      it.map(processDoc(pipe, cfg))
    }
  }
}
