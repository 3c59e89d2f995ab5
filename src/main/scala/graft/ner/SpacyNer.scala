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
  *    not a token), and the kazu setter is write-once
  *    (data/__init__.py:466-481) so a document arriving with spans already
  *    set routes to the failure path.
  *
  * The spaCy runtime is environment-blocked (zero egress, no model
  * packages), so the pipeline sits behind the pluggable
  * [[SpacyLikePipeline]] slot exactly as C6/C7/C9/C10 are built.
  * [[RulerPipeline]] is the first-party stand-in: spaCy's own
  * `EntityRuler + sentencizer` recipe (the documented way to assemble a
  * rule-based spaCy NER pipeline) re-implemented over the repo's
  * deterministic tokenizer — leftmost-longest phrase matching on token
  * boundaries, which is exactly the EntityRuler/PhraseMatcher contract.
  * Divergence from a TRAINED spaCy statistical model is model-dependent
  * only, same boundary as C2/C6/D3.
  *
  * Scale shape: one narrow mapPartitions over the doc stream — the pipeline
  * is executor-pinned (the reference holds one spaCy pipeline per worker
  * via its SpacyPipelines registry), per-document work is O(section
  * length × patterns), nothing shuffles.
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
    * Patterns map a token sequence (its surface text) to a label;
    * matching is the PhraseMatcher contract — exact token-boundary match,
    * leftmost-longest, non-overlapping (spaCy `doc.ents` cannot overlap).
    * Sentence spans are token-derived, as spaCy's are. */
  final class RulerPipeline(patterns: Map[String, String]) extends SpacyLikePipeline {
    // each phrase tokenized once at construction (PhraseMatcher compiles
    // patterns up front); keyed by first token text for O(tokens) scans
    private val compiled: Map[String, Seq[(Array[String], String)]] =
      patterns.toSeq.map { case (phrase, label) =>
        val toks = graft.text.Tokenizer.tokenize(phrase)
          .map(t => phrase.substring(t.start, t.end))
        (toks, label)
      }.filter(_._1.nonEmpty)
        .groupBy(_._1.head)
        .map { case (h, ps) => h -> ps.sortBy(-_._1.length) } // longest-first

    def processSingle(text: String): SpacyDoc = {
      val toks = graft.text.Tokenizer.tokenize(text)
      val words = toks.map(t => text.substring(t.start, t.end))
      val ents = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
      var i = 0
      while (i < toks.length) {
        val cands = compiled.getOrElse(words(i), Nil)
        val hit = cands.find { case (ph, _) =>
          ph.indices.forall(j => i + j < toks.length && words(i + j) == ph(j))
        }
        hit match {
          case Some((ph, label)) =>
            ents += ((toks(i).start, toks(i + ph.length - 1).end, label))
            i += ph.length // non-overlapping, leftmost-longest consumed
          case None => i += 1
        }
      }
      val sents = graft.text.Tokenizer.sentenceSpans(text).flatMap { s =>
        val in = toks.filter(t => t.start >= s.start && t.end <= s.end)
        if (in.isEmpty) None else Some((in.head.start, in.last.end))
      }
      SpacyDoc(ents.toSeq, sents)
    }
  }

  final case class Config(addSentenceSpans: Boolean = true)

  /** One document through the step (spacy_ner.py __call__:24-41). */
  def processDoc(pipeline: SpacyLikePipeline, cfg: Config = Config())(doc: KDoc): KDoc =
    try {
      val sections = doc.sections.map { sec =>
        if (cfg.addSentenceSpans && sec.sentenceSpans.nonEmpty)
          throw new IllegalStateException("Immutable sentence_spans is already set")
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
        val withEnts = sec.copy(entities = sec.entities ++ appended)
        if (cfg.addSentenceSpans)
          withEnts.copy(sentenceSpans =
            spacyDoc.sents.map { case (s, e) => CharSpan(s, e) })
        else withEnts
      }
      doc.copy(sections = sections)
    } catch {
      case e: Exception => doc.copy(error = Some(s"$Namespace: ${e.getMessage}"))
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
