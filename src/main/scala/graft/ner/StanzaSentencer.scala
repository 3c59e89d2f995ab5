package graft.ner

import graft.model._

/** Stanza sentence-segmentation step plane — SURVEY.md §2.C10
  * (ref kazu/steps/other/stanza.py:14-118).
  *
  * The reference step is a thin wrapper over a `stanza.Pipeline` trained on
  * the GENIA treebank and does exactly one thing: per section, run the
  * pipeline and set `section.sentence_spans` to one CharSpan per sentence.
  * Its load-bearing semantics, all pinned here:
  *
  *  1. **Token-derived spans** (stanza.py:113-116): the span is
  *     `(sent.tokens[0].start_char, sent.tokens[-1].end_char)` — first-token
  *     start to last-token end — NOT a full cover of the text. Leading and
  *     trailing whitespace is OUTSIDE the span, and all-whitespace text
  *     yields no spans. This differs observably from the basic pipeline's
  *     sentencizer spans (B6, [[graft.text.Tokenizer.sentenceSpans]]), which
  *     cover the text gap-free.
  *  2. **Write-once, duplicate-free sentence spans**
  *     (kazu/data/__init__.py:466-481): the `Section.sentence_spans` setter
  *     raises `AttributeError("Immutable sentence_spans is already set")`
  *     when spans exist and asserts "There are duplicate sentence spans".
  *     A step exception routes the document to the failure path
  *     (`KDoc.error`, ref PROCESSING_EXCEPTION metadata,
  *     kazu/pipeline/__init__.py) — one bad page never kills a task.
  *  3. **Partial work survives a failure**: the reference mutates the doc
  *     in place, so when the setter raises on section k, sections 0..k-1
  *     keep their freshly-set spans in the failed-docs dump.
  *
  * The stanza neural pipeline itself is environment-blocked (zero egress,
  * torch model weights), so the tokenizer sits behind the pluggable
  * [[StanzaLikePipeline]] slot exactly as the C6/C7/C9 model planes are
  * built. [[MiniGeniaPipeline]] is the first-party stand-in: the repo's own
  * deterministic tokenizer (B5) bucketed by the rule sentencizer (B6) in
  * one O(tokens) cursor pass — real token offsets, real sentence grouping,
  * divergence from the trained GENIA model documented as model-dependent
  * only.
  *
  * Scale shape: one narrow mapPartitions over the doc stream — the pipeline
  * is executor-pinned, per-document work is O(section length), nothing
  * shuffles.
  */
object StanzaSentencer {

  val Namespace = "StanzaStep"

  /** The pipeline slot (ref stanza.Pipeline: `stanza_doc.sentences`, each
    * carrying tokens with `start_char`/`end_char`). One (start, end) pair
    * per sentence — already reduced to first-token start / last-token end,
    * in document order; offsets are half-open [start, end). */
  trait StanzaLikePipeline extends Serializable {
    def sentenceSpans(text: String): Seq[(Int, Int)]
  }

  /** First-party stand-in: B5 tokens grouped by B6 sentence boundaries via
    * the shared single-cursor bucketing (tokens never straddle a boundary;
    * token-less sentences are dropped — stanza never emits one). */
  object MiniGeniaPipeline extends StanzaLikePipeline {
    def sentenceSpans(text: String): Seq[(Int, Int)] =
      SpacyNer.tokenDerivedSents(text, graft.text.Tokenizer.tokenize(text))
  }

  /** One document through the step (stanza.py __call__:110-118). */
  def processDoc(pipeline: StanzaLikePipeline)(doc: KDoc): KDoc = {
    val done = scala.collection.mutable.ArrayBuffer.empty[Section]
    try {
      doc.sections.foreach { sec =>
        if (sec.sentenceSpans.nonEmpty)
          // the reference setter's exact contract (data/__init__.py:481)
          throw new IllegalStateException("Immutable sentence_spans is already set")
        val spans = pipeline.sentenceSpans(sec.text)
          .map { case (s, e) => CharSpan(s, e) }
        if (spans.distinct != spans)
          throw new IllegalStateException("There are duplicate sentence spans")
        done += sec.copy(sentenceSpans = spans)
      }
      doc.copy(sections = done.toSeq)
    } catch {
      case e: Exception =>
        // in-place mutation fidelity: already-processed sections keep
        // their new spans; the raising section and its successors are
        // untouched (the setter raises before mutating)
        doc.copy(
          sections = done.toSeq ++ doc.sections.drop(done.length),
          // message-less exceptions (bare NPEs from a user pipeline) would
          // dump an undiagnosable "null" — fall back to class+message
          error = Some(s"$Namespace: ${Option(e.getMessage).getOrElse(e.toString)}"))
    }
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
