package graft.ontology

/** Deterministic synthetic ontology over the driver-generated web-text corpus
  * vocabulary (TESTDATA.md `documents` table) — the `DummyParser` analogue
  * (ref kazu/tests/utils.py:88-120, FIXTURES.md §2). Two parsers, two entity
  * classes, with deliberate ambiguity ("scan", "join" map to two ids each)
  * and nested-mention cases ("hash join" ⊃ "join", "table scan" ⊃ "table")
  * to exercise EquivalentIdSet splitting, disambiguation and overlap merge.
  */
object CorpusOntology {

  val OpsParser = "OPS"
  val SysParser = "SYS"

  def entityClassOf(parser: String): String = parser match {
    case OpsParser => "operator"
    case SysParser => "component"
    case p         => sys.error(s"unknown parser $p")
  }

  /** Common corpus words downgraded to POSSIBLE confidence
    * (IsCommonWord analogue, autocuration.py:38-60). */
  val CommonWords: Set[String] = Set("the", "a", "big", "small", "fast", "slow")

  val rows: Seq[OntologyRow] = {
    def op(idx: String, label: String, syns: String*) =
      syns.map(s => OntologyRow(OpsParser, "operator", idx, label, s, "exactSyn"))
    def sysr(idx: String, label: String, syns: String*) =
      syns.map(s => OntologyRow(SysParser, "component", idx, label, s, "exactSyn"))
    (
      op("OP:HASH_JOIN", "hash join", "hash join") ++
      op("OP:MERGE_JOIN", "merge join", "merge join", "merge") ++
      // ambiguous synonym "join" shared by two distinct operators
      op("OP:HASH_JOIN", "hash join", "join") ++
      op("OP:MERGE_JOIN", "merge join", "join") ++
      op("OP:SORT", "sort", "sort") ++
      op("OP:TABLE_SCAN", "table scan", "table scan") ++
      op("OP:INDEX_SCAN", "index scan", "index scan") ++
      // ambiguous synonym "scan" shared by the two scans
      op("OP:TABLE_SCAN", "table scan", "scan") ++
      op("OP:INDEX_SCAN", "index scan", "scan") ++
      op("OP:WINDOW", "window", "window") ++
      op("OP:FILTER", "filter", "filter") ++
      // genuinely AMBIGUOUS symbolic synonym: "XSF" maps to two operators
      // with dissimilar default labels, so scoreAndGroupIds keeps TWO
      // EquivalentIdSets (symbolic + sim 0.0 < 0.70) — the shape that
      // engages the disambiguation ladder (contrast "scan", which merges
      // into ONE set as MERGED_AS_NON_SYMBOLIC and needs no
      // disambiguation). Absent from all corpus text; exercised by the
      // kg_disambig oracle suffix.
      op("OP:SORT", "sort", "XSF") ++
      op("OP:FILTER", "filter", "XSF") ++
      op("OP:AGGREGATE", "aggregate", "agg", "group") ++
      op("OP:ORDER_BY", "order by", "order") ++
      sysr("SYS:SPARK", "spark", "spark") ++
      sysr("SYS:TABLE", "table", "table") ++
      sysr("SYS:COLUMN", "column", "column") ++
      sysr("SYS:ROW", "row", "row") ++
      sysr("SYS:STREAM", "stream", "stream") ++
      sysr("SYS:BATCH", "batch", "batch") ++
      sysr("SYS:VECTOR", "vector", "vector") ++
      sysr("SYS:QUERY", "query", "query") ++
      sysr("SYS:KEY", "key", "key") ++
      sysr("SYS:VALUE", "value", "value")
    )
  }

  /** Gazetteer terms with their entity class — used by tests and by the
    * DuckDB oracle SQL (SparkEntry.oracleSql), which re-derives expected
    * mention counts with word-boundary regexes over the same corpus.
    */
  val nerTerms: Seq[(String, String)] =
    rows.map(r => (r.syn, r.entityClass)).distinct.sortBy(identity)
}
