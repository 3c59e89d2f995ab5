package graft.ner

import graft.model._
import graft.text.{Normalizer, Tokenizer}

/** GLiNER-style zero-shot NER harness (ref kazu/steps/ner/gliner.py:38-319,
  * SURVEY.md §2.C6). The trained GLiNER backbone cannot enter the
  * zero-egress sandbox, but everything AROUND the model is pure logic and
  * is ported faithfully over a pluggable [[Gliner.Backbone]]:
  *
  *  - sentence-batched prediction (ref `_create_batches`): whole sentences
  *    are packed into ≤ maxContextSize-token batches, which eliminates the
  *    sliding-window problem (an entity cannot cross a sentence);
  *  - label-prompt shuffles (ref `iterations` + seeded shuffle): the class
  *    prompts are re-ordered per iteration to cancel prompt-order bias;
  *  - cross-prediction conflict resolution: [[Gliner.MajorityVoteScorer]]
  *    / [[Gliner.MaxScoreScorer]] pool evidence PER BATCH OF DOCUMENTS and
  *    choose one winning entity per match string (incl. the reference's
  *    example-keyed-by-class lookup, gliner.py:101-108 — replicated
  *    verbatim);
  *  - Aho-Corasick re-propagation (ref `finalise` / `_automaton_matching`):
  *    the winning matches are compiled into a case-sensitive automaton and
  *    EVERY word-boundary-valid occurrence in the document — predicted or
  *    not — is emitted with the winner's class; the raw predictions
  *    themselves are not emitted (faithful to the reference).
  *
  * The default backbone is MiniBern ([[Gliner.MiniBernBackbone]]): real
  * batched transformer inference scores each predicted span by its words'
  * winning-label softmax confidence. Tests drive the harness with scripted
  * backbones to pin the conflict/batching/re-propagation semantics.
  */
object Gliner {

  val Namespace = "GlinerStep"

  final case class Pred(start: Int, end: Int, matchStr: String,
      label: String, score: Double)

  /** The model slot (ref GLiNER.batch_predict_entities): given one
    * sentence and the ordered label prompts, return scored entity spans
    * with sentence-relative offsets. */
  trait Backbone {
    def predict(sentence: String, labels: Seq[String], threshold: Double): Seq[Pred]
  }

  /** (The reference's `batch_size` knob — how many packed sentence chunks
    * go into one `batch_predict_entities` call — is a GPU-throughput
    * grouping with no semantic effect; this harness's [[Backbone]] is
    * invoked once per packed chunk, so the knob is deliberately absent
    * rather than silently ignored.) */
  final case class Config(
      promptToClass: Map[String, String],
      threshold: Double = 0.3,
      maxContextSize: Int = 118, // ref: model max_len 128 − 10 special tokens
      iterations: Int = 5,
      scorer: () => ConflictScorer = () => new MajorityVoteScorer
  )

  /** Deterministic label-order shuffles (ref gliner.py:227-236 uses
    * random.seed(42) + random.sample; any fixed seed satisfies the intent —
    * cancel prompt-order bias deterministically). */
  def labelSets(prompts: Seq[String], iterations: Int): Seq[Seq[String]] = {
    val sorted = prompts.sorted
    val sets = scala.collection.mutable.LinkedHashSet.empty[Seq[String]]
    var state = 42L
    def nextInt(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound + bound) % bound).toInt
    }
    var guard = 0
    while (sets.size < math.min(iterations, factorialBound(sorted.size)) && guard < 10000) {
      val a = sorted.toArray
      var i = a.length - 1
      while (i > 0) { val j = nextInt(i + 1); val t = a(i); a(i) = a(j); a(j) = t; i -= 1 }
      sets += a.toSeq
      guard += 1
    }
    sets.toSeq
  }

  private def factorialBound(n: Int): Int = {
    var f = 1L; var i = 2
    while (i <= n && f < 10000) { f *= i; i += 1 }
    math.min(f, 10000L).toInt
  }

  // --- conflict scorers (ref gliner.py:38-123) -----------------------------

  /** One predicted entity during conflict scoring. */
  final case class Scored(docIdx: Int, sectionIdx: Int, m: Mention, score: Double)

  sealed abstract class ConflictScorer {
    protected val perDoc =
      scala.collection.mutable.LinkedHashMap.empty[Int, scala.collection.mutable.ArrayBuffer[Scored]]
    def update(e: Scored): Unit = {
      perDoc.getOrElseUpdate(e.docIdx, scala.collection.mutable.ArrayBuffer.empty) += e
      updateInternal(e)
    }
    protected def updateInternal(e: Scored): Unit
    protected def chooseBestMatch(entMatch: String): Scored

    /** Ref `finalise`: per document, winner per distinct match string →
      * automaton → re-propagate over every section. Returns the new
      * mentions per (docIdx, sectionIdx). */
    def finalise(docs: IndexedSeq[KDoc]): Map[(Int, Int), Seq[Mention]] = {
      val out = scala.collection.mutable.HashMap.empty[(Int, Int), Seq[Mention]]
      perDoc.foreach { case (docIdx, ents) =>
        // winner per match string; ref keys the result by the WINNER's
        // match (best_ent_per_match[best_ent.match] = best_ent)
        val bestPerMatch = scala.collection.mutable.LinkedHashMap.empty[String, Scored]
        ents.map(_.m.matchStr).distinct.sorted.foreach { entMatch =>
          val best = chooseBestMatch(entMatch)
          bestPerMatch(best.m.matchStr) = best
        }
        val doc = docs(docIdx)
        val keys = bestPerMatch.keys.toArray.sorted
        if (keys.nonEmpty) {
          // case-sensitive automaton over the winning surface forms (the
          // reference's ahocorasick automaton is built on raw matches)
          val trie = graft.index.AhoCorasick.build(keys)
          doc.sections.zipWithIndex.foreach { case (section, sectionIdx) =>
            val text = section.text
            val (starts, ends) = Tokenizer.boundaries(text)
            val found = scala.collection.mutable.ArrayBuffer.empty[Mention]
            trie.scan(text, (endIdx, keyIdx) => {
              val key = keys(keyIdx)
              val startIdx = endIdx - key.length + 1
              if (Tokenizer.wordIsValid(startIdx, endIdx, starts, ends)) {
                val winner = bestPerMatch(key)
                found += Mention(
                  matchStr = key,
                  entityClass = winner.m.entityClass,
                  spans = Seq(CharSpan(startIdx, endIdx + 1)),
                  namespace = Namespace,
                  mentionConfidence = winner.m.mentionConfidence,
                  matchNorm = Normalizer.normalize(key, winner.m.entityClass))
              }
            })
            if (found.nonEmpty)
              out((docIdx, sectionIdx)) =
                out.getOrElse((docIdx, sectionIdx), Seq.empty) ++ found.toSeq
          }
        }
      }
      out.toMap
    }
  }

  /** Ref MajorityVoteScorer (gliner.py:96-109): per match string, the class
    * seen most often wins; the returned entity is the LAST example of that
    * class regardless of match (the reference keys its example dict by
    * class — replicated verbatim, including that quirk). */
  final class MajorityVoteScorer extends ConflictScorer {
    private val classCounter =
      scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[String, Int]]
    private val exampleByClass = scala.collection.mutable.HashMap.empty[String, Scored]
    protected def updateInternal(e: Scored): Unit = {
      val c = classCounter.getOrElseUpdate(e.m.matchStr, scala.collection.mutable.HashMap.empty)
      c(e.m.entityClass) = c.getOrElse(e.m.entityClass, 0) + 1
      exampleByClass(e.m.entityClass) = e
    }
    protected def chooseBestMatch(entMatch: String): Scored = {
      // most_common(1) tie-break = counter insertion order in the ref;
      // deterministic stand-in: count desc, class asc
      val best = classCounter(entMatch).toSeq.sortBy { case (cls, n) => (-n, cls) }.head._1
      exampleByClass(best)
    }
  }

  /** Ref MaxScoreScorer (gliner.py:112-123): per match string, the highest
    * scoring prediction wins (strictly greater replaces — first seen wins
    * ties). */
  final class MaxScoreScorer extends ConflictScorer {
    private val bestByMatch = scala.collection.mutable.HashMap.empty[String, Scored]
    protected def updateInternal(e: Scored): Unit = {
      val cur = bestByMatch.get(e.m.matchStr)
      if (cur.isEmpty || e.score > cur.get.score) bestByMatch(e.m.matchStr) = e
    }
    protected def chooseBestMatch(entMatch: String): Scored = bestByMatch(entMatch)
  }

  // --- sentence batching (ref _create_batches / _create_multidoc_batches) --

  final case class BatchItem(docIdx: Int, sectionIdx: Int,
      start: Int, end: Int, sentence: String)

  /** Pack whole sentences into ≤ maxContextSize-token runs per section
    * (ref gliner.py:258-287): a sentence never splits across batches. */
  def sectionBatches(
      text: String,
      sentenceSpans: Seq[CharSpan],
      maxContextSize: Int
  ): Seq[(Int, Int)] = {
    val spans = if (sentenceSpans.nonEmpty) sentenceSpans
      else Tokenizer.sentenceSpans(text)
    if (spans.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var tokensThisBatch = 0
    var batchStart = spans.head.start
    var lastEnd: Option[Int] = None
    spans.zipWithIndex.foreach { case (sp, i) =>
      val tokenCount = Tokenizer.tokenize(text.substring(sp.start, sp.end)).size
      if (tokensThisBatch + tokenCount >= maxContextSize && lastEnd.isDefined) {
        out += ((batchStart, lastEnd.get))
        tokensThisBatch = 0
        batchStart = sp.start
      } else if (i == spans.size - 1) {
        out += ((batchStart, sp.end))
      }
      lastEnd = Some(sp.end)
      tokensThisBatch += tokenCount
    }
    // ref quirk: when the size cap fires ON the final sentence, that
    // sentence starts a new batch that the loop never flushes — emit it
    // (the reference's generator drops it; we keep the document complete
    // and note the divergence)
    if (out.nonEmpty && out.last._2 < spans.last.end && batchStart > out.last._1)
      out += ((batchStart, spans.last.end))
    out.toSeq
  }

  // --- the step ------------------------------------------------------------

  /** Process one partition-batch of documents (ref `__call__` over an
    * Iterable[Document]: conflict evidence pools across the whole batch,
    * re-propagation is per document). */
  def processBatch(cfg: Config, backbone: Backbone)(docs: Seq[KDoc]): Seq[KDoc] = {
    val scorer = cfg.scorer()
    val prompts = cfg.promptToClass.keys.toSeq.sorted
    val shuffles = labelSets(prompts, cfg.iterations)
    val docArr = docs.toIndexedSeq
    docArr.zipWithIndex.foreach { case (doc, docIdx) =>
      if (doc.error.isEmpty)
        doc.sections.zipWithIndex.foreach { case (section, sectionIdx) =>
          sectionBatches(section.text, section.sentenceSpans, cfg.maxContextSize)
            .foreach { case (bStart, bEnd) =>
              val sentence = section.text.substring(bStart, bEnd)
              shuffles.foreach { labels =>
                backbone.predict(sentence, labels, cfg.threshold).foreach { p =>
                  cfg.promptToClass.get(p.label).foreach { cls =>
                    val m = Mention(
                      matchStr = p.matchStr,
                      entityClass = cls,
                      spans = Seq(CharSpan(bStart + p.start, bStart + p.end)),
                      namespace = Namespace,
                      mentionConfidence = MentionConfidence.HighlyLikely,
                      matchNorm = Normalizer.normalize(p.matchStr, cls))
                    scorer.update(Scored(docIdx, sectionIdx, m, p.score))
                  }
                }
              }
            }
        }
    }
    val propagated = scorer.finalise(docArr)
    docArr.zipWithIndex.map { case (doc, docIdx) =>
      if (doc.error.isDefined) doc
      else doc.copy(sections = doc.sections.zipWithIndex.map { case (s, si) =>
        propagated.get((docIdx, si)) match {
          case Some(ms) => s.copy(entities = s.entities ++ ms)
          case None     => s
        }
      })
    }
  }

  // --- MiniBern stand-in backbone ------------------------------------------

  /** The pluggable-model slot filled with the in-repo transformer: token
    * classification over the sentence, each span scored by its WEAKEST
    * word's winning-label softmax confidence (min across the span — a
    * span is only as certain as its least certain word). Label prompts act as a class
    * filter (a real GLiNER conditions on them; an encoder-classifier
    * cannot, so prompt ORDER is a no-op here — the shuffle iterations
    * exercise the harness, and the conflict scorer sees `iterations`
    * copies of each prediction, which is vote-neutral). */
  final class MiniBernBackbone(session: TokenClassifier.ModelSession)
      extends Backbone {
    def predict(sentence: String, labels: Seq[String],
        threshold: Double): Seq[Pred] = {
      import TokenClassifier._
      val pieces = wordpieces(sentence)
      if (pieces.isEmpty) return Seq.empty
      val fs = frames(pieces)
      val logits = fs.grouped(BatchSize).flatMap(b => session.predict(b)).toArray
      val activated = logits.map(_.map(Activations.softmax))
      val words = stitchToWords(fs, activated)
      val spans = findSpans(sentence, words)
      spans.flatMap { span =>
        val score = span.words.iterator.map(_.logits.map(_.max).max.toDouble).min
        val ms = spansToMentions(Seq(span), sentence)
        ms.collectFirst {
          case m if labels.contains(m.entityClass) && score >= threshold =>
            Pred(m.start, m.end, m.matchStr, m.entityClass, score)
        }
      }
    }
  }

  def processPartition(cfg: Config)(docs: Iterator[KDoc]): Iterator[KDoc] = {
    val backbone = new MiniBernBackbone(TokenClassifier.executorSession)
    processBatch(cfg, backbone)(docs.toSeq).iterator
  }
}
