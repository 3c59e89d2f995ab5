package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI

/** The serving surface (ref web API routes, kazu/web/routes.py:20-29):
  * in-process per-document pipeline behind the JDK HttpServer. */
class ServerSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("ner_and_linking / ner_only / batch endpoints serve the pipeline") {
    val server = graft.serve.Server.start(graft.index.Resources.corpus, 0)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String): String = {
        val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .header("Content-Type", "application/json").build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 200, resp.body())
        resp.body()
      }

      // full pipeline: grounded mappings present
      val full = mapper.readTree(post("/api/kazu/ner_and_linking",
        """{"text":"the filter runs in spark"}"""))
      val ents = full.path("sections").path(0).path("entities")
      assert(ents.size() > 0)
      val idxs = (0 until ents.size()).flatMap { i =>
        val ms = ents.path(i).path("mappings")
        (0 until ms.size()).map(j => ms.path(j).path("idx").asText())
      }
      assert(idxs.contains("OP:FILTER") && idxs.contains("SYS:SPARK"), idxs)

      // ner_only: mentions, no mappings (step group semantics) — incl. a
      // transformer-NER-only term ("customer" is not in the gazetteer)
      val ner = mapper.readTree(post("/api/kazu/ner_only",
        """{"text":"the customer filter"}"""))
      val nerEnts = ner.path("sections").path(0).path("entities")
      val matches = (0 until nerEnts.size()).map(i =>
        nerEnts.path(i).path("match").asText()).toSet
      assert(matches == Set("customer", "filter"), matches)
      (0 until nerEnts.size()).foreach(i =>
        assert(nerEnts.path(i).path("mappings").size() == 0))

      // batch: array in, array out, aligned
      val batch = mapper.readTree(post("/api/kazu/batch",
        """[{"text":"sort here"},{"text":"no entities whatsoever"}]"""))
      assert(batch.isArray && batch.size() == 2)
      assert(batch.path(0).path("sections").path(0).path("entities").size() > 0)
      assert(batch.path(1).path("sections").path(0).path("entities").size() == 0)

      // malformed request → 400, not a crash
      val bad = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/kazu/ner_only"))
        .POST(HttpRequest.BodyPublishers.ofString("{nope")).build()
      assert(client.send(bad, HttpResponse.BodyHandlers.ofString()).statusCode() == 400)

      // batch requires an array — a single object is a client error, not
      // silent single-mode
      val single = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/kazu/batch"))
        .POST(HttpRequest.BodyPublishers.ofString("""{"text":"sort"}""")).build()
      assert(client.send(single, HttpResponse.BodyHandlers.ofString()).statusCode() == 400)

      // well-formed JSON whose FIELD VALUES are malformed (non-numeric
      // score) is still the client's fault → 400, not a 500 pipeline error
      val badField = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/api/kazu/linking_only"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"url":"u","warcTs":0,"text":"t","lang":"en","sections":[
            |{"text":"t","offset":0,"entities":[{"match":"t","entity_class":"c",
            |"spans":[{"start":0,"end":1}],"namespace":"n","mention_confidence":"PROBABLE",
            |"candidates":[{"parser_name":"p","synonym_norm":"s","search_score":"0.9x"}],
            |"mappings":[]}]}]}""".stripMargin.replace("\n", ""))).build()
      val badFieldResp = client.send(badField, HttpResponse.BodyHandlers.ofString())
      assert(badFieldResp.statusCode() == 400, badFieldResp.body())
      assert(badFieldResp.body().contains("malformed document field"))

      // step-group composability over HTTP: ner_only's response piped
      // through linking_only equals the one-shot full route
      val text = """{"text":"the filter runs in spark with a merge join"}"""
      val nerResp = post("/api/kazu/ner_only", text)
      val composed = mapper.readTree(post("/api/kazu/linking_only", nerResp))
      val oneShot = mapper.readTree(post("/api/kazu/ner_and_linking", text))
      assert(composed == oneShot,
        s"composed=$composed\noneShot=$oneShot")
    } finally server.stop(0)
  }
}
