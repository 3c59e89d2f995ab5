package graft.ner

import graft.model._
import graft.text.{Normalizer, Tokenizer}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** LLM-NER harness (ref kazu/steps/ner/llm_ner.py:28-291, SURVEY.md §2.C7).
  * The LLM service call is environment-blocked (zero egress), but the
  * entire result-processing plane is pure logic, ported faithfully over a
  * pluggable [[LlmNer.LlmModel]] backbone:
  *
  *  - [[LlmNer.FreeFormResultParser]] (llm_ner.py:38-62): JSON repair —
  *    locate the first object/array in free-form model output, prefer the
  *    array form when it opens before the object, merge array items in
  *    order; ANY failure (including the reference's guaranteed-exception
  *    paths when no `{` exists) degrades to an empty result, never an
  *    error. The `"{}" in result` shortcut is replicated verbatim — it
  *    fires even when a valid object follows.
  *  - [[LlmNer.StructuredOutputResultParser]] (llm_ner.py:65-80): strict
  *    array-of-objects with a configurable entity-class key; malformed
  *    output RAISES, which the step surfaces as a failed-document row
  *    (A4 sink semantics) exactly like the reference's step exception.
  *  - Section strategies (llm_ner.py:182-250): one concatenated "\n" call
  *    per doc, or per-section calls processed in REVERSE order so earlier
  *    sections override later ones on key conflicts; per-section keys are
  *    lower-cased + stripped (concatenated keys are NOT — reference
  *    quirk kept), failed sections are dropped
  *    (PROCESS_INDIVIDUALLY_AND_DROP_FAILED_SECTIONS) or fail the doc
  *    (..._KEEP_FAILED_SECTIONS — the reference raises here despite the
  *    name, so the document lands in the failure sink).
  *  - Span reconciliation (llm_ner.py:259-291): the parsed matches are
  *    compiled into a case-insensitive Aho-Corasick automaton and every
  *    word-boundary-valid occurrence in each section is emitted with the
  *    stored match string's original case and HIGHLY_LIKELY confidence.
  *
  * Scale shape: one narrow mapPartitions — the backbone is executor-pinned
  * per partition, the automaton is per-document (its keys come from the
  * model response), nothing shuffles.
  */
object LlmNer {

  val Namespace = "LLMNERStep"

  /** The model slot (ref LLMModel protocol): raw completion text for a
    * document/section text. Production backbones (Azure/Vertex in the
    * reference) are service calls; specs use scripted backbones and
    * [[DictionaryBackbone]]. */
  trait LlmModel extends Serializable {
    def complete(text: String): String
  }

  /** A deterministic stand-in "LLM": emits a JSON object of the configured
    * vocabulary terms present in the text. Lets the full harness run
    * end-to-end (and in pipeline specs) without a service. */
  final case class DictionaryBackbone(vocab: Seq[(String, String)]) extends LlmModel {
    def complete(text: String): String = {
      val toks = text.split("\\s+").toSet
      val hits = vocab.filter { case (term, _) => toks.contains(term) }
      val m = new ObjectMapper()
      val node = m.createObjectNode()
      hits.foreach { case (term, cls) => node.put(term, cls) }
      m.writeValueAsString(node)
    }
  }

  /** Parsed result: insertion-ordered (match → class). */
  type ParsedResult = Vector[(String, String)]

  sealed trait ResultParser extends Serializable {
    /** @throws Exception only when the parser is strict (structured). */
    def parse(result: String): ParsedResult
  }

  private def classOf(v: JsonNode): String =
    if (v.isTextual) v.textValue() else v.toString

  /** Python dict.update semantics: an existing key keeps its ORIGINAL
    * insertion position, only the value changes; new keys append. */
  private def upsert(vec: Vector[(String, String)], k: String, v: String)
      : Vector[(String, String)] = {
    val i = vec.indexWhere(_._1 == k)
    if (i < 0) vec :+ (k -> v) else vec.updated(i, k -> v)
  }

  private def objectPairs(node: JsonNode): Vector[(String, String)] = {
    val obj = node.asInstanceOf[ObjectNode] // non-object → CCE → caught/raised
    var out = Vector.empty[(String, String)]
    val it = obj.fields()
    while (it.hasNext) {
      val e = it.next()
      out = upsert(out, e.getKey, classOf(e.getValue))
    }
    out
  }

  /** Ref FreeFormResultParser.parse_result — all failure paths → empty. */
  case object FreeFormResultParser extends ResultParser {
    private val mapper = new ObjectMapper()
    def parse(result: String): ParsedResult = {
      if (result.contains("{}")) return Vector.empty
      try {
        val curly = result.indexOf('{')
        val square = result.indexOf('[')
        if (square == -1 || square > curly) {
          // dict branch; curly == -1 reproduces the reference's
          // guaranteed json.loads failure (negative-index slice) → empty
          if (curly == -1) Vector.empty
          else objectPairs(
            mapper.readTree(result.substring(curly, result.lastIndexOf('}') + 1)))
        } else {
          val arr = mapper
            .readTree(result.substring(square, result.lastIndexOf(']') + 1))
            .asInstanceOf[ArrayNode]
          var out = Vector.empty[(String, String)]
          val it = arr.elements()
          while (it.hasNext)
            objectPairs(it.next()).foreach { case (k, v) =>
              out = upsert(out, k, v) // later items override IN PLACE
            }
          out
        }
      } catch { case _: Exception => Vector.empty }
    }
  }

  /** Ref StructuredOutputResultParser — strict; malformed output throws and
    * the step records a failed document. */
  final case class StructuredOutputResultParser(entityKey: String) extends ResultParser {
    @transient private lazy val mapper = new ObjectMapper()
    def parse(result: String): ParsedResult = {
      val arr = mapper.readTree(result).asInstanceOf[ArrayNode]
      var out = Vector.empty[(String, String)]
      val it = arr.elements()
      while (it.hasNext) {
        val item = it.next()
        val key = item.get("entity_match")
        val cls = item.get(entityKey)
        if (key == null || cls == null)
          throw new NoSuchElementException(
            s"missing entity_match/$entityKey in $item")
        val k = if (key.isTextual) key.textValue() else key.toString
        out = upsert(out, k, classOf(cls))
      }
      out
    }
  }

  sealed trait SectionStrategy extends Serializable
  case object ConcatenateAndProcess extends SectionStrategy
  case object ProcessIndividuallyAndDropFailedSections extends SectionStrategy
  case object ProcessIndividuallyAndKeepFailedSections extends SectionStrategy

  /** Raw model responses for observability (metadata plane of the
    * reference; our KDoc carries no metadata map, so they ride alongside). */
  final case class RawResponse(sectionName: String, raw: String)

  /** Process one document: returns the annotated doc (or a failed-doc row)
    * plus the raw responses. */
  def processDoc(
      model: LlmModel,
      parser: ResultParser,
      strategy: SectionStrategy = ConcatenateAndProcess
  )(doc: KDoc): (KDoc, Seq[RawResponse]) = {
    if (doc.error.isDefined) return (doc, Seq.empty)
    val raws = scala.collection.mutable.ArrayBuffer.empty[RawResponse]
    try {
      var sections = doc.sections
      val results: ParsedResult = strategy match {
        case ConcatenateAndProcess =>
          val raw = model.complete(sections.map(_.text).mkString("\n"))
          raws += RawResponse("<doc>", raw)
          parser.parse(raw) // concatenated keys keep their case (ref quirk)
        case _ =>
          var acc = Vector.empty[(String, String)]
          // reversed: earlier sections are processed LAST and override
          sections.reverse.foreach { section =>
            val raw = model.complete(section.text)
            raws += RawResponse(section.name, raw)
            val parsed = parser.parse(raw)
            if (parsed.nonEmpty)
              parsed.foreach { case (k, v) =>
                val key = k.toLowerCase(java.util.Locale.ROOT).trim
                acc = upsert(acc, key, v)
              }
            else if (strategy == ProcessIndividuallyAndDropFailedSections) {
              // ref `doc.sections.remove(section)` removes the FIRST
              // value-equal element, not the identical instance — matters
              // when a document holds duplicate equal sections
              val i = sections.indexWhere(_ == section)
              if (i >= 0) sections = sections.patch(i, Nil, 1)
            }
            else
              throw new IllegalStateException(s"Failed to parse result: $raw")
          }
          acc
      }
      val annotated =
        if (results.isEmpty) sections
        else {
          // automaton over lower-cased keys; payload keeps stored case.
          // Same-lowercase keys: the LAST stored wins (dict semantics).
          val byLower = scala.collection.mutable.LinkedHashMap.empty[String, (String, String)]
          results.foreach { case (k, v) =>
            byLower(k.toLowerCase(java.util.Locale.ROOT)) = (k, v)
          }
          // pyahocorasick add_word("") is a no-op — empty keys never match
          val keys = byLower.keys.filter(_.nonEmpty).toArray
          if (keys.isEmpty) sections
          else {
          val ac = graft.index.AhoCorasick.build(keys)
          sections.map { section =>
            val lower = section.text.toLowerCase(java.util.Locale.ROOT)
            val (starts, ends) = Tokenizer.boundaries(section.text)
            val found = scala.collection.mutable.ArrayBuffer.empty[Mention]
            ac.scan(lower, (endIncl, keyIdx) => {
              val keyLower = keys(keyIdx)
              val start = endIncl - keyLower.length + 1
              if (Tokenizer.wordIsValid(start, endIncl, starts, ends)) {
                val (orig, cls) = byLower(keyLower)
                found += Mention(
                  matchStr = orig,
                  entityClass = cls,
                  spans = Seq(CharSpan(start, endIncl + 1)),
                  namespace = Namespace,
                  mentionConfidence = MentionConfidence.HighlyLikely,
                  matchNorm = Normalizer.normalize(orig, cls))
              }
            })
            section.copy(entities = section.entities ++ found.toSeq)
          }
          }
        }
      (doc.copy(sections = annotated), raws.toSeq)
    } catch {
      case e: Exception =>
        (doc.copy(error = Some(s"LLMNERStep: ${e.getMessage}")), raws.toSeq)
    }
  }

  /** Dataset plane: one narrow mapPartitions, backbone instantiated once
    * per partition (executor-pinned — the Spark analogue of the
    * reference's per-worker model session). */
  def annotate(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.Dataset[KDoc],
      modelFactory: () => LlmModel,
      parser: ResultParser,
      strategy: SectionStrategy = ConcatenateAndProcess
  ): org.apache.spark.sql.Dataset[KDoc] = {
    import spark.implicits._
    docs.mapPartitions { it =>
      val model = modelFactory()
      it.map(d => processDoc(model, parser, strategy)(d)._1)
    }
  }
}
