package graft.ner

import graft.model._

/** Stanza sentence-segmentation step plane — SURVEY.md §2.C10
  * (ref kazu/steps/other/stanza.py:14-118).
  *
  * The reference step is a thin wrapper over a `stanza.Pipeline` trained on
  * the GENIA treebank and does exactly one thing: per section, run the
  * pipeline and set `section.sentence_spans` to one CharSpan per sentence.
  * Its two load-bearing semantics, both pinned here:
  *
  *  1. **Token-derived spans** (stanza.py:113-116): the span is
  *     `(sent.tokens[0].start_char, sent.tokens[-1].end_char)` — first-token
  *     start to last-token end — NOT a full cover of the text. Leading and
  *     trailing whitespace is OUTSIDE the span, and all-whitespace text
  *     yields no spans. This differs observably from the basic pipeline's
  *     sentencizer spans (B6, [[graft.text.Tokenizer.sentenceSpans]]), which
  *     cover the text gap-free.
  *  2. **Write-once sentence spans** (kazu/data/__init__.py:466-481): the
  *     `Section.sentence_spans` setter raises `AttributeError("Immutable
  *     sentence_spans is already set")` when spans exist and asserts the
  *     spans are duplicate-free. A step exception routes the document to
  *     the failure path (`KDoc.error`, ref PROCESSING_EXCEPTION metadata,
  *     kazu/pipeline/__init__.py) — one bad page never kills a task.
  *
  * The stanza neural pipeline itself is environment-blocked (zero egress,
  * torch model weights), so the tokenizer sits behind the pluggable
  * [[StanzaLikePipeline]] slot exactly as the C6/C7/C9 model planes are
  * built. [[MiniGeniaPipeline]] is the first-party stand-in: the repo's own
  * deterministic tokenizer (B5) bucketed by the rule sentencizer (B6) —
  * real token offsets, real sentence grouping, divergence from the trained
  * GENIA model documented as model-dependent only.
  *
  * Scale shape: one narrow mapPartitions over the doc stream — the pipeline
  * is executor-pinned, per-document work is O(section length), nothing
  * shuffles.
  */
object StanzaSentencer {

  val Namespace = "StanzaStep"

  /** The pipeline slot (ref stanza.Pipeline: `stanza_doc.sentences`, each
    * carrying tokens with `start_char`/`end_char`). One inner Seq per
    * sentence, in document order; offsets are half-open [start, end). */
  trait StanzaLikePipeline extends Serializable {
    def sentenceTokens(text: String): Seq[Seq[(Int, Int)]]
  }

  /** First-party stand-in: B5 tokens grouped by B6 sentence boundaries.
    * Tokens never straddle a sentence boundary (boundaries fall on
    * whitespace; tokens contain none), so bucketing by containment is
    * exact. Sentences with no tokens (all-whitespace cover) are dropped —
    * stanza never emits a token-less sentence. */
  object MiniGeniaPipeline extends StanzaLikePipeline {
    def sentenceTokens(text: String): Seq[Seq[(Int, Int)]] = {
      val toks = graft.text.Tokenizer.tokenize(text)
      graft.text.Tokenizer.sentenceSpans(text).flatMap { s =>
        val inSent = toks.iterator
          .filter(t => t.start >= s.start && t.end <= s.end)
          .map(t => (t.start, t.end)).toSeq
        if (inSent.isEmpty) None else Some(inSent)
      }
    }
  }

  /** One document through the step (stanza.py __call__:110-118). */
  def processDoc(pipeline: StanzaLikePipeline)(doc: KDoc): KDoc =
    try {
      val sections = doc.sections.map { sec =>
        if (sec.sentenceSpans.nonEmpty)
          // the reference setter's exact contract (data/__init__.py:481)
          throw new IllegalStateException("Immutable sentence_spans is already set")
        val spans = pipeline.sentenceTokens(sec.text)
          .map(toks => CharSpan(toks.head._1, toks.last._2))
        require(spans.distinct == spans, "There are duplicate sentence spans")
        sec.copy(sentenceSpans = spans)
      }
      doc.copy(sections = sections)
    } catch {
      case e: Exception => doc.copy(error = Some(s"$Namespace: ${e.getMessage}"))
    }

  /** Dataset plane: one narrow mapPartitions, pipeline instantiated once
    * per partition (the reference holds one stanza.Pipeline per worker). */
  def annotate(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.Dataset[KDoc],
      pipelineFactory: () => StanzaLikePipeline = () => MiniGeniaPipeline
  ): org.apache.spark.sql.Dataset[KDoc] = {
    import spark.implicits._
    docs.mapPartitions { it =>
      val pipe = pipelineFactory()
      it.map(processDoc(pipe))
    }
  }
}
