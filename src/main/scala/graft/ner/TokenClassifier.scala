package graft.ner

import graft.model._
import graft.text.{Normalizer, Tokenizer}

/** Transformer token-classification NER plumbing (ref
  * TransformersModelForTokenClassificationNerStep,
  * kazu/steps/ner/hf_token_classification.py:64-352 + TokenizedWordProcessor
  * kazu/steps/ner/tokenized_word_processor.py:16-433).
  *
  * All the Spark-side and sequence-processing machinery is real — wordpiece
  * tokenization with offsets, sliding-window framing (max_seq 128 / stride
  * 16 / batch 4, ref conf defaults), half-stride frame stitching, word
  * reassembly, BIO span decoding, per-class suffix stripping — executed in
  * `mapPartitions` with an executor-pinned model session. The model forward
  * pass itself is a STUB (no ONNX runtime jar in this container):
  * [[StubModel]] emits deterministic logits from a tiny embedded
  * vocabulary, standing in for the TinyBERN2 ONNX session. Swapping in a
  * real model touches ONLY [[ModelSession]].
  */
object TokenClassifier {

  val Namespace = "TransformerNer"
  val MaxSeqLen = 128 // ref conf/TransformersModelForTokenClassificationNerStep/default.yaml:5
  val Stride = 16     // :4
  val BatchSize = 4   // :3

  val Labels: IndexedSeq[String] = IndexedSeq(
    "O", "B-operator", "I-operator", "B-component", "I-component")

  // --- wordpiece-ish tokenizer with char offsets --------------------------

  final case class Piece(tokenId: Int, token: String, start: Int, end: Int, wordId: Int)

  /** Greedy fixed-size wordpiece split (stand-in for the HF tokenizer; same
    * output contract: subword pieces with char offsets + word ids). */
  def wordpieces(text: String): IndexedSeq[Piece] = {
    val words = Tokenizer.tokenize(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Piece]
    var wid = 0
    words.foreach { w =>
      val wtext = text.substring(w.start, w.end)
      var off = 0
      var first = true
      while (off < wtext.length) {
        val len = math.min(4, wtext.length - off)
        val pieceText = (if (first) "" else "##") + wtext.substring(off, off + len)
        out += Piece(pieceText.hashCode, pieceText, w.start + off,
          w.start + off + len, wid)
        off += len
        first = false
      }
      wid += 1
    }
    out.toIndexedSeq
  }

  // --- model session (executor-pinned) ------------------------------------

  trait ModelSession extends Serializable {
    /** logits(frame)(tokenIdx)(labelIdx) for a batch of frames (padded). */
    def predict(frames: Seq[IndexedSeq[Piece]]): Array[Array[Array[Float]]]
    def version: String
  }

  /** Deterministic stub: tags whole words from an embedded vocabulary with
    * B-/I- labels (first piece B, continuation pieces I). Production: an
    * ONNX Runtime session created lazily per executor JVM, batched input
    * ids, softmax over logits.
    */
  final class StubModel(vocab: Map[String, String]) extends ModelSession {
    val version = "stub-ner/1"
    private val labelIdx: Map[String, Int] = Labels.zipWithIndex.toMap
    def predict(frames: Seq[IndexedSeq[Piece]]): Array[Array[Array[Float]]] =
      frames.map { frame =>
        val out = new Array[Array[Float]](frame.length)
        // single pass over runs of equal wordId (pieces are word-ordered)
        var i = 0
        while (i < frame.length) {
          var j = i + 1
          while (j < frame.length && frame(j).wordId == frame(i).wordId) j += 1
          val sb = new java.lang.StringBuilder()
          var k = i
          while (k < j) {
            val t = frame(k).token
            sb.append(if (t.startsWith("##")) t.substring(2) else t)
            k += 1
          }
          val cls = vocab.get(sb.toString.toLowerCase(java.util.Locale.ROOT))
          k = i
          while (k < j) {
            val logits = new Array[Float](Labels.size)
            java.util.Arrays.fill(logits, -10f)
            cls match {
              case Some(c) =>
                val prefix = if (frame(k).token.startsWith("##")) "I-" else "B-"
                logits(labelIdx(prefix + c)) = 10f
              case None => logits(0) = 10f
            }
            out(k) = logits
            k += 1
          }
          i = j
        }
        out
      }.toArray
  }

  /** The stub's "learned" vocabulary over the synthetic corpus: overlaps the
    * gazetteer on some terms (exercising overlap merge) and adds terms the
    * trie does not know (exercising the dictionary-linking path D1/D2). */
  val CorpusStubVocab: Map[String, String] = Map(
    "window" -> "operator",
    "sort" -> "operator",
    "vector" -> "component",
    "stream" -> "component",
    "customer" -> "component" // not in gazetteer → needs fuzzy linking
  )

  private object SessionHolder {
    // lazy singleton per executor JVM (ref: per-Ray-worker model copy,
    // amortized per JVM here)
    lazy val session: ModelSession = new StubModel(CorpusStubVocab)
  }
  def executorSession: ModelSession = SessionHolder.session

  // --- framing + stitching -------------------------------------------------

  final case class Word(
      pieces: IndexedSeq[Piece],
      logits: IndexedSeq[Array[Float]],
      charStart: Int,
      charEnd: Int, // inclusive of last char? ref uses end offset; we keep exclusive
      wordId: Int
  )

  /** Slice pieces into overlapping frames of (MaxSeqLen - 2) content tokens
    * with `Stride` token overlap (the [CLS]/[SEP] slots are accounted for,
    * not materialized). */
  def frames(pieces: IndexedSeq[Piece]): Seq[IndexedSeq[Piece]] = {
    val content = MaxSeqLen - 2
    if (pieces.length <= content) Seq(pieces)
    else {
      val step = content - Stride
      val out = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Piece]]
      var start = 0
      while (start < pieces.length) {
        out += pieces.slice(start, math.min(start + content, pieces.length))
        if (start + content >= pieces.length) start = pieces.length
        else start += step
      }
      out.toSeq
    }
  }

  /** Stitch frames back into words, dropping half-stride margins
    * (ref frame_to_tok_word, hf_token_classification.py:184-277). */
  def stitchToWords(
      frameList: Seq[IndexedSeq[Piece]],
      logits: Array[Array[Array[Float]]]
  ): IndexedSeq[Word] = {
    val halfStride = Stride / 2
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Piece, Array[Float])]
    val n = frameList.size
    frameList.zipWithIndex.foreach { case (frame, fi) =>
      val startIdx =
        if (n == 1 || fi == 0) 0 else halfStride
      val endIdx =
        if (n == 1 || fi == n - 1) frame.length else frame.length - halfStride
      var i = startIdx
      while (i < endIdx) {
        kept += ((frame(i), logits(fi)(i)))
        i += 1
      }
    }
    // dedup overlapping piece ranges (keep first occurrence per char start)
    val seen = scala.collection.mutable.Set.empty[Int]
    val uniq = kept.filter { case (p, _) => seen.add(p.start) }
    // group consecutive pieces by word id
    val out = scala.collection.mutable.ArrayBuffer.empty[Word]
    var buf = scala.collection.mutable.ArrayBuffer.empty[(Piece, Array[Float])]
    def flush(): Unit = if (buf.nonEmpty) {
      val ps = buf.map(_._1).toIndexedSeq
      out += Word(ps, buf.map(_._2).toIndexedSeq,
        ps.head.start, ps.last.end, ps.head.wordId)
      buf = scala.collection.mutable.ArrayBuffer.empty
    }
    uniq.foreach { case (p, l) =>
      if (buf.nonEmpty && buf.last._1.wordId != p.wordId) flush()
      buf += ((p, l))
    }
    flush()
    out.toIndexedSeq
  }

  // --- BIO decode (SimpleSpanFinder port, tokenized_word_processor.py) ----

  val SpanBreakingChars: Set[Char] = Set('(', ')', ';')

  /** Per-class suffix strip regexes (ref conf yaml:33-34 gene example). */
  val StripRe: Map[String, scala.util.matching.Regex] = Map(
    "gene" -> "( (gene|protein)s?)+$".r
  )

  final case class TokSpan(clazz: String, words: Seq[Word])

  def bioLabels(word: Word): Set[(String, Option[String])] =
    word.logits.map { l =>
      val best = Labels(l.indices.maxBy(l(_)))
      if (best == "O") ("O", None)
      else {
        val Array(bio, cls) = best.split("-", 2)
        (bio, Some(cls))
      }
    }.toSet

  def findSpans(text: String, words: IndexedSeq[Word]): Seq[TokSpan] = {
    val active = scala.collection.mutable.ArrayBuffer.empty[(String, scala.collection.mutable.ArrayBuffer[Word])]
    val closed = scala.collection.mutable.ArrayBuffer.empty[TokSpan]
    var any = false
    def closeAll(): Unit = {
      active.foreach { case (c, ws) =>
        if (ws.nonEmpty) closed += TokSpan(c, ws.toSeq)
      }
      active.clear()
    }
    def startSpans(labels: Set[(String, Option[String])], w: Word): Unit =
      labels.foreach {
        case ("B", Some(c)) =>
          active += ((c, scala.collection.mutable.ArrayBuffer(w)))
        case _ =>
      }
    words.foreach { w =>
      val labels = bioLabels(w)
      val continueOk = {
        val classes = labels.map(_._2)
        !(classes.contains(None) ||
          (w.charStart > 0 && SpanBreakingChars.contains(text.charAt(w.charStart - 1))))
      }
      if (!any || active.isEmpty) startSpans(labels, w)
      else if (continueOk) {
        active.foreach { case (c, ws) =>
          // B entries first so the copy-on-new-B snapshot precedes any
          // append of the current word (ref :106-126; the reference
          // iterates a set — B-first makes the order deterministic)
          labels.toSeq.sortBy(_._1).foreach { case (bio, cls) =>
            if (bio == "B" && cls.contains(c))
              closed += TokSpan(c, ws.toSeq) // copy-on-new-B
            if (cls.contains(c)) ws += w
          }
        }
      } else {
        closeAll()
        startSpans(labels, w)
      }
      any = true
    }
    closeAll()
    closed.toSeq
  }

  /** spans → Mentions with trailing-space fix + suffix strip
    * (ref spans_to_entities, tokenized_word_processor.py:368-433). */
  def spansToMentions(spans: Seq[TokSpan], text: String): Seq[Mention] =
    spans.map { span =>
      val start = span.words.map(_.charStart).min
      var end = span.words.map(_.charEnd).max
      var matchStr = text.substring(start, math.min(end, text.length))
      if (matchStr.length > 1 && matchStr.last == ' ' && matchStr.exists(_.isLetter)) {
        end -= 1
        matchStr = text.substring(start, end)
      }
      StripRe.get(span.clazz).foreach { re =>
        matchStr = re.replaceAllIn(matchStr, "")
        end = start + matchStr.length
      }
      Mention(
        matchStr = matchStr,
        entityClass = span.clazz,
        spans = Seq(CharSpan(start, end)),
        namespace = Namespace,
        mentionConfidence = MentionConfidence.Probable,
        matchNorm = Normalizer.normalize(matchStr, span.clazz))
    }

  // --- the stage -----------------------------------------------------------

  def processText(session: ModelSession, text: String): Seq[Mention] = {
    val pieces = wordpieces(text)
    if (pieces.isEmpty) return Seq.empty
    val fs = frames(pieces)
    // batched forward passes (BatchSize frames per call)
    val logits = fs.grouped(BatchSize).flatMap(b => session.predict(b)).toArray
    val words = stitchToWords(fs, logits)
    spansToMentions(findSpans(text, words), text)
  }

  def processDoc(session: ModelSession)(doc: KDoc): KDoc =
    if (doc.error.isDefined) doc
    else
      try doc.copy(sections = doc.sections.map(s =>
        s.copy(entities = s.entities ++ processText(session, s.text))))
      catch {
        case e: Exception =>
          doc.copy(error = Some(s"TokenClassifier: ${e.getMessage}"))
      }
}
