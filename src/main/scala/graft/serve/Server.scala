package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.index.Resources
import graft.link.{ClassFilter, Ladders}
import graft.model._
import graft.ner.{TokenClassifier, TrieNer}
import graft.pipeline.Pipeline

import java.net.InetSocketAddress
import scala.jdk.CollectionConverters._

/** The serving surface (ref kazu/web/server.py:88-649, route constants
  * kazu/web/routes.py:20-29): the reference deploys its Pipeline behind
  * FastAPI + Ray Serve actors, each replica holding a full pipeline copy.
  * Here every document stage is a per-document pure function — the same
  * functions the Spark `mapPartitions` runs — so the service is the JDK
  * HttpServer plus one in-process resource bundle: no Spark session, no job
  * launch per request, and request latency is the per-doc pipeline cost.
  *
  *   - POST /api/kazu/ner_and_linking   {"text": "..."} → full pipeline
  *   - POST /api/kazu/ner_only          {"text": "..."} → C1 + C2 only
  *     (step groups, ref conf/Pipeline/default.yaml:14-20)
  *   - POST /api/kazu/batch             [{"text": "..."}, ...]
  *
  * Responses are the canonical document JSON (url, sections, entities with
  * spans/confidence/mappings) — the same structural schema the batch JSON
  * sink writes.
  */
object Server {

  private val mapper = new ObjectMapper()

  final class Service(resources: Resources) {
    private val runner = Ladders.default
    private val session = TokenClassifier.executorSession

    def nerOnly(doc: KDoc): KDoc =
      TokenClassifier.processDoc(session)(TrieNer.processDoc(resources)(doc))

    def nerAndLinking(doc: KDoc): KDoc =
      Pipeline.fusedStages(resources, runner, ClassFilter.Rules(),
        withTransformerNer = true)(Iterator(doc)).next()

    def docFromText(text: String, idx: String): KDoc =
      KDoc(idx, new java.sql.Timestamp(0L), text, "en",
        Seq(Section("body", text)))
  }

  // ---- response JSON (canonical document schema) ---------------------------

  def docToJsonNode(doc: KDoc): java.util.Map[String, Object] = {
    def mappingNode(m: Mapping) = Map[String, Object](
      "default_label" -> m.defaultLabel, "source" -> m.source,
      "parser_name" -> m.parserName, "idx" -> m.idx,
      "string_match_strategy" -> m.stringMatchStrategy,
      "string_match_confidence" -> m.stringMatchConfidence,
      "disambiguation_strategy" -> m.disambiguationStrategy.orNull,
      "disambiguation_confidence" -> m.disambiguationConfidence.orNull
    ).asJava
    def entityNode(e: Mention) = Map[String, Object](
      "match" -> e.matchStr, "entity_class" -> e.entityClass,
      "namespace" -> e.namespace,
      "match_norm" -> e.matchNorm,
      "mention_confidence" -> MentionConfidence.name(e.mentionConfidence),
      "spans" -> e.spans.map(s => Map[String, Object](
        "start" -> Int.box(s.start), "end" -> Int.box(s.end)).asJava).asJava,
      "mappings" -> e.mappings.map(mappingNode).asJava
    ).asJava
    def sectionNode(s: Section) = Map[String, Object](
      "name" -> s.name, "text" -> s.text,
      "entities" -> s.entities.map(entityNode).asJava
    ).asJava
    Map[String, Object](
      "idx" -> doc.url,
      "sections" -> doc.sections.map(sectionNode).asJava,
      "error" -> doc.error.orNull
    ).asJava
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handler(service: Service, f: KDoc => KDoc): HttpHandler =
    (ex: HttpExchange) =>
      try {
        val root = mapper.readTree(ex.getRequestBody)
        if (root.isArray) {
          val out = root.elements().asScala.zipWithIndex.map { case (node, i) =>
            docToJsonNode(f(service.docFromText(node.path("text").asText(""), s"doc-$i")))
          }.toSeq
          respond(ex, 200, mapper.writeValueAsString(out.asJava))
        } else {
          val doc = service.docFromText(root.path("text").asText(""), "doc-0")
          respond(ex, 200, mapper.writeValueAsString(docToJsonNode(f(doc))))
        }
      } catch {
        case e: Exception =>
          respond(ex, 400, mapper.writeValueAsString(
            Map[String, Object]("error" -> s"${e.getClass.getSimpleName}: ${e.getMessage}").asJava))
      }

  /** Start the server; port 0 picks an ephemeral port (tests). */
  def start(resources: Resources, port: Int): HttpServer = {
    val service = new Service(resources)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/api/kazu/ner_and_linking", handler(service, service.nerAndLinking))
    server.createContext("/api/kazu/ner_only", handler(service, service.nerOnly))
    server.createContext("/api/kazu/batch", handler(service, service.nerAndLinking))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(
      math.max(2, Runtime.getRuntime.availableProcessors / 2)))
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val port = sys.env.getOrElse("GRAFT_SERVE_PORT", "8081").toInt
    val server = start(Resources.corpus, port)
    println(s"graft serving on :${server.getAddress.getPort} " +
      "(/api/kazu/ner_and_linking, /api/kazu/ner_only, /api/kazu/batch)")
    Thread.currentThread.join()
  }
}
