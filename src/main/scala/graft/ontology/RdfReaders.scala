package graft.ontology

import scala.collection.mutable

/** Concrete ontology parsers for the formats real public ontologies ship in
  * (ref kazu/ontology_preprocessing/parsers.py):
  *
  *  - [[Turtle]]: a self-contained Turtle/TTL parser (prefixes, IRIs,
  *    prefixed names, literals with language/datatype tags, `a`, `;`/`,`
  *    continuations, comments) — the subset real OBO-family turtle dumps
  *    use. No rdflib/Jena exists in this container, so the triples layer is
  *    first-party.
  *  - [[RdfGraphReader]]: RDFGraphParser semantics (parsers.py:467-628) —
  *    `subject_objects(label_predicate)` drives iteration, a URI regex
  *    validates subjects, include/exclude entity patterns filter on triple
  *    presence, synonym predicates add rows with `mapping_type =
  *    str(predicate)`, and GO-style parsers drop labels containing
  *    "obsolete" (parsers.py:764-778).
  *  - [[RdfGraphReader.skosXl]]: SKOSXLGraphParser (parsers.py:630-677) —
  *    label/synonym predicates are the two-step SKOS-XL property paths
  *    `skosxl:prefLabel / skosxl:literalForm` and `skosxl:altLabel /
  *    skosxl:literalForm`.
  *  - [[OboGraphReader]]: MondoOntologyParser semantics (parsers.py:940-994)
  *    over OBO-Graphs JSON (`graphs[0].nodes[]` with `id`, `lbl`,
  *    `meta.synonyms[{pred, val}]`): URI-regex node filter, skip nodes
  *    without `lbl`, keep only `hasExactSynonym` synonyms, mapping types
  *    `lbl` / `hasExactSynonym`.
  *
  * These run driver-side: ontologies are the engine's dimension tables
  * (≤ millions of rows vs 10^12 pages); the result feeds the broadcast
  * resource build like every other reader.
  */
object Rdf {

  /** An RDF node: IRI or literal (lexical form only; lang/datatype are
    * dropped after parsing, matching str(obj) in the reference). */
  final case class Node(value: String, isLiteral: Boolean)

  final case class Triple(subj: String, pred: String, obj: Node)

  /** A predicate reference: a direct IRI or a two-step property path
    * (rdflib's `pred1 / pred2`, used by SKOS-XL). */
  sealed trait Ref { def show: String }
  final case class Direct(iri: String) extends Ref { def show: String = iri }
  final case class Path2(first: String, second: String) extends Ref {
    def show: String = s"$first / $second"
  }

  final class Graph(val triples: Seq[Triple]) {
    private val bySubjPred: Map[(String, String), Seq[Node]] =
      triples.groupBy(t => (t.subj, t.pred)).view.mapValues(_.map(_.obj)).toMap
    private val byPred: Map[String, Seq[Triple]] =
      triples.groupBy(_.pred)
    private val tripleSet: Set[(String, String, String)] =
      triples.map(t => (t.subj, t.pred, t.obj.value)).toSet

    def objects(subj: String, pred: Ref): Seq[Node] = pred match {
      case Direct(iri) => bySubjPred.getOrElse((subj, iri), Seq.empty)
      case Path2(first, second) =>
        objects(subj, Direct(first))
          .filterNot(_.isLiteral)
          .flatMap(mid => objects(mid.value, Direct(second)))
    }

    /** (subject, object) pairs of a predicate, in document order. */
    def subjectObjects(pred: Ref): Seq[(String, Node)] = pred match {
      case Direct(iri) =>
        byPred.getOrElse(iri, Seq.empty).map(t => (t.subj, t.obj))
      case p: Path2 =>
        triples.map(_.subj).distinct
          .flatMap(s => objects(s, p).map(o => (s, o)))
    }

    def contains(subj: String, pred: String, obj: String): Boolean =
      tripleSet((subj, pred, obj))
  }

  /** Minimal Turtle parser. Supports the constructs OBO-family /SKOS dumps
    * use: @prefix and @base, `a`, IRIs, prefixed names, blank nodes (as
    * opaque ids), string literals (single/triple-quoted) with optional
    * `@lang` or `^^datatype`, numeric literals, `;` and `,` continuations,
    * and `#` comments.
    */
  object Turtle {

    def parseFile(path: String): Graph = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try parse(src.mkString) finally src.close()
    }

    def parse(text: String): Graph = {
      val toks = tokenize(text)
      val prefixes = mutable.HashMap.empty[String, String]
      val out = mutable.ArrayBuffer.empty[Triple]
      var i = 0

      def resolve(tok: String): Node = {
        if (tok.startsWith("<") && tok.endsWith(">"))
          Node(tok.substring(1, tok.length - 1), isLiteral = false)
        else if (tok.startsWith(LitMark))
          Node(tok.substring(LitMark.length), isLiteral = true)
        else if (tok == "a")
          Node("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", isLiteral = false)
        else if (tok.startsWith("_:"))
          Node(tok, isLiteral = false)
        else {
          val colon = tok.indexOf(':')
          require(colon >= 0, s"unresolvable token: $tok")
          val pfx = tok.substring(0, colon)
          val base = prefixes.getOrElse(pfx,
            sys.error(s"unknown prefix '$pfx:' in $tok"))
          Node(base + tok.substring(colon + 1), isLiteral = false)
        }
      }

      while (i < toks.length) {
        toks(i) match {
          case "@prefix" | "PREFIX" =>
            val pfx = toks(i + 1).stripSuffix(":")
            val iri = toks(i + 2)
            prefixes(pfx) = iri.substring(1, iri.length - 1)
            i += 3
            if (i < toks.length && toks(i) == ".") i += 1
          case "@base" | "BASE" =>
            i += 2
            if (i < toks.length && toks(i) == ".") i += 1
          case _ =>
            // subject predicateObjectList .
            val subj = resolve(toks(i)).value
            i += 1
            var done = false
            while (!done) {
              val pred = resolve(toks(i)).value
              i += 1
              var moreObjs = true
              while (moreObjs) {
                out += Triple(subj, pred, resolve(toks(i)))
                i += 1
                if (i < toks.length && toks(i) == ",") i += 1
                else moreObjs = false
              }
              if (i < toks.length && toks(i) == ";") {
                i += 1
                // a trailing `;` before `.` is legal turtle
                if (i < toks.length && toks(i) == ".") { done = true; i += 1 }
              } else {
                done = true
                if (i < toks.length && toks(i) == ".") i += 1
              }
            }
        }
      }
      new Graph(out.toSeq)
    }

    /** Literal tokens are marked with a NUL-delimited "LIT" prefix — NUL
      * cannot appear in tokenized Turtle, so the marker never collides. */
    private val LitMark = "\u0000LIT\u0000"

    private def tokenize(text: String): IndexedSeq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      val n = text.length
      def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
      while (i < n) {
        val c = text.charAt(i)
        if (isWs(c)) i += 1
        else if (c == '#') { while (i < n && text.charAt(i) != '\n') i += 1 }
        else if (c == '<') {
          val j = text.indexOf('>', i)
          require(j > 0, s"unterminated IRI at $i")
          out += text.substring(i, j + 1)
          i = j + 1
        } else if (c == '"') {
          val (lit, next) =
            if (text.startsWith("\"\"\"", i)) {
              val j = text.indexOf("\"\"\"", i + 3)
              require(j > 0, "unterminated long literal")
              (text.substring(i + 3, j), j + 3)
            } else {
              val sb = new StringBuilder
              var j = i + 1
              var closed = false
              while (j < n && !closed) {
                val ch = text.charAt(j)
                if (ch == '\\' && j + 1 < n) {
                  // \uXXXX / \UXXXXXXXX numeric escapes (Turtle §6.4) consume
                  // their hex digits — appending only the char after the
                  // backslash would leave them as literal text ("u03B2…")
                  val esc = text.charAt(j + 1)
                  if ((esc == 'u' || esc == 'U') && j + 2 + (if (esc == 'u') 4 else 8) <= n) {
                    val width = if (esc == 'u') 4 else 8
                    val hex = text.substring(j + 2, j + 2 + width)
                    sb.appendAll(Character.toChars(Integer.parseInt(hex, 16)))
                    j += 2 + width
                  } else { sb.append(unescape(esc)); j += 2 }
                } else if (ch == '"') closed = true
                else { sb.append(ch); j += 1 }
              }
              require(closed, "unterminated literal")
              (sb.toString, j + 1)
            }
          i = next
          // optional @lang or ^^datatype — consumed, value keeps lexical form
          if (i < n && text.charAt(i) == '@') {
            while (i < n && !isWs(text.charAt(i)) && !";,.".contains(text.charAt(i))) i += 1
          } else if (text.startsWith("^^", i)) {
            i += 2
            if (i < n && text.charAt(i) == '<') i = text.indexOf('>', i) + 1
            else while (i < n && !isWs(text.charAt(i)) && !";,".contains(text.charAt(i))) i += 1
          }
          out += LitMark + lit
        } else if (c == ';' || c == ',' ) {
          out += c.toString; i += 1
        } else if (c == '.' && (i + 1 >= n || isWs(text.charAt(i + 1)))) {
          out += "."; i += 1
        } else {
          val start = i
          while (i < n && !isWs(text.charAt(i)) && text.charAt(i) != ';' &&
            text.charAt(i) != ',' &&
            !(text.charAt(i) == '.' && (i + 1 >= n || isWs(text.charAt(i + 1))))) i += 1
          val tok = text.substring(start, i)
          if (tok.matches("[+-]?[0-9.]+([eE][+-]?[0-9]+)?"))
            out += LitMark + tok
          else out += tok
        }
      }
      out.toIndexedSeq
    }

    private def unescape(c: Char): Char = c match {
      case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
      case other => other
    }
  }
}

/** RDFGraphParser / SKOSXLGraphParser semantics over a [[Rdf.Graph]]. */
object RdfGraphReader {
  import Rdf._

  val RdfsLabel = "http://www.w3.org/2000/01/rdf-schema#label"
  val HasExactSynonym = "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym"
  val SkosXlPrefLabel: Ref = Path2(
    "http://www.w3.org/2008/05/skos-xl#prefLabel",
    "http://www.w3.org/2008/05/skos-xl#literalForm")
  val SkosXlAltLabel: Ref = Path2(
    "http://www.w3.org/2008/05/skos-xl#altLabel",
    "http://www.w3.org/2008/05/skos-xl#literalForm")

  final case class Config(
      parserName: String,
      entityClass: String,
      uriRegex: String,
      synonymPredicates: Seq[Ref] = Seq(Direct(HasExactSynonym)),
      labelPredicate: Ref = Direct(RdfsLabel),
      includeEntityPatterns: Seq[(String, String)] = Seq.empty,
      excludeEntityPatterns: Seq[(String, String)] = Seq.empty,
      dropObsoleteLabels: Boolean = false // GeneOntologyParser behavior
  )

  /** SKOS-XL convenience config (ref SKOSXLGraphParser): pref/alt label
    * property paths stand in for label/synonym predicates. */
  def skosXl(parserName: String, entityClass: String, uriRegex: String): Config =
    Config(parserName, entityClass, uriRegex,
      synonymPredicates = Seq(SkosXlAltLabel),
      labelPredicate = SkosXlPrefLabel)

  def read(graph: Graph, cfg: Config): Seq[OntologyRow] = {
    val uriRe = cfg.uriRegex.r
    val rows = mutable.ArrayBuffer.empty[OntologyRow]
    graph.subjectObjects(cfg.labelPredicate).foreach { case (sub, labelObj) =>
      val valid = uriRe.findPrefixMatchOf(sub).isDefined && // re.match semantics
        cfg.includeEntityPatterns.forall { case (p, v) => graph.contains(sub, p, v) } &&
        !cfg.excludeEntityPatterns.exists { case (p, v) => graph.contains(sub, p, v) }
      val label = labelObj.value
      if (valid && !(cfg.dropObsoleteLabels && label.contains("obsolete"))) {
        rows += OntologyRow(cfg.parserName, cfg.entityClass, sub, label, label,
          cfg.labelPredicate.show)
        cfg.synonymPredicates.foreach { synPred =>
          graph.objects(sub, synPred).foreach { syn =>
            rows += OntologyRow(cfg.parserName, cfg.entityClass, sub, label,
              syn.value, synPred.show)
          }
        }
      }
    }
    rows.toSeq
  }

  def readFile(path: String, cfg: Config): Seq[OntologyRow] =
    read(Rdf.Turtle.parseFile(path), cfg)
}

/** MondoOntologyParser semantics (parsers.py:940-994) over OBO-Graphs JSON. */
object OboGraphReader {
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import scala.jdk.CollectionConverters._

  def readFile(
      path: String,
      parserName: String,
      entityClass: String,
      uriRegex: String = "^http://purl.obolibrary.org/obo/(MONDO|HP)_[0-9]+$"
  ): Seq[OntologyRow] = {
    val root = new ObjectMapper().readTree(new java.io.File(path))
    read(root, parserName, entityClass, uriRegex)
  }

  def read(
      root: JsonNode,
      parserName: String,
      entityClass: String,
      uriRegex: String
  ): Seq[OntologyRow] = {
    val uriRe = uriRegex.r
    val nodes = root.path("graphs").path(0).path("nodes")
    val out = mutable.ArrayBuffer.empty[OntologyRow]
    nodes.elements().asScala.foreach { node =>
      val idx = node.path("id").asText("")
      if (uriRe.findPrefixMatchOf(idx).isDefined && node.hasNonNull("lbl")) {
        val label = node.path("lbl").asText()
        out += OntologyRow(parserName, entityClass, idx, label, label, "lbl")
        node.path("meta").path("synonyms").elements().asScala.foreach { syn =>
          if (syn.path("pred").asText("") == "hasExactSynonym")
            out += OntologyRow(parserName, entityClass, idx, label,
              syn.path("val").asText(), "hasExactSynonym")
        }
      }
    }
    out.toSeq
  }

  /** find_kb for OBO purl ids: final path segment before the underscore
    * (ref parsers.py:946-951), e.g. ".../MONDO_0000123" → "MONDO". */
  def findKb(iri: String): String =
    iri.split("/").last.split("_").head
}
