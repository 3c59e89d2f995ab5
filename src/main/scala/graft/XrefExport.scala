package graft

/** Export our E17 xref expansions for the reference-code parity replay:
  * tools/xref_parity.py builds the reference's OWN CrossReferenceManager
  * from the same planted xref DB and replays create_xref_mappings over the
  * same input mappings, comparing field-by-field (PARITY.md pattern — the
  * reference's code is EXECUTED, not reimplemented, on the replay side).
  * No Spark session needed: Xref.expand is a pure per-mapping function.
  */
object XrefExport {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/xref_export.json")
    val xm = SparkEntry.plantedXrefMap

    // inputs: the two planted sources' mappings plus negatives that must
    // NOT expand (un-xref'd idx; unknown source)
    val inputs = Seq(
      graft.model.Mapping("filter", "OP", "OPS", "OP:FILTER",
        "ExactMatchMapping", "HIGHLY_LIKELY", Some("DefinedElsewhereInDocument"),
        Some("HIGHLY_LIKELY")),
      graft.model.Mapping("spark", "SYS", "SYS", "SYS:SPARK",
        "ExactMatchMapping", "PROBABLE", None, None),
      graft.model.Mapping("sort", "OP", "OPS", "OP:SORT",
        "ExactMatchMapping", "HIGHLY_LIKELY", None, None),
      graft.model.Mapping("query", "ZZZ", "SYS", "SYS:QUERY",
        "ExactMatchMapping", "POSSIBLE", None, None))

    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def opt(o: Option[String]) = o.map(q).getOrElse("null")
    def mappingJson(m: graft.model.Mapping): String =
      s"""{"default_label": ${q(m.defaultLabel)}, "source": ${q(m.source)},
         | "parser_name": ${q(m.parserName)}, "idx": ${q(m.idx)},
         | "string_match_confidence": ${q(m.stringMatchConfidence)},
         | "disambiguation_strategy": ${opt(m.disambiguationStrategy)},
         | "disambiguation_confidence": ${opt(m.disambiguationConfidence)}}"""
        .stripMargin.replace("\n", "")

    val db = xm.map.toSeq.sortBy(_._1).map { case ((src, idx), targets) =>
      s"""{"source": ${q(src)}, "idx": ${q(idx)}, "targets": [${targets.map(t =>
        s"""{"parser_name": ${q(t.parserName)}, "target_source": ${q(t.source)}, "target_idx": ${q(t.idx)}, "default_label": ${q(t.defaultLabel)}}""").mkString(", ")}]}"""
    }.mkString("[", ", ", "]")

    val cases = inputs.map { m =>
      val expanded = xm.expand(m).map(mappingJson).mkString("[", ", ", "]")
      s"""{"input": ${mappingJson(m)}, "expanded": $expanded}"""
    }.mkString("[", ", ", "]")

    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      s"""{"xref_db": $db, "cases": $cases}""")
    println(s"wrote $out (${inputs.size} cases)")
  }
}
