package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ontology._

class OntologySpec extends AnyFunSuite {

  // DummyParser-style rows (ref kazu/tests/utils.py:88-120): ids
  // first/second/third with multiple syns, incl. an ambiguous symbol.
  private def rows = Seq(
    OntologyRow("TEST", "disease", "first", "1 disease alpha", "1 disease alpha", "exact"),
    OntologyRow("TEST", "disease", "first", "1 disease alpha", "disease one", "exact"),
    OntologyRow("TEST", "disease", "second", "2 disease beta", "2 disease beta", "exact"),
    OntologyRow("TEST", "disease", "second", "2 disease beta", "disease two", "exact"),
    // ambiguous symbolic syn shared by two unrelated ids
    OntologyRow("TEST", "disease", "first", "1 disease alpha", "D1X", "exact"),
    OntologyRow("TEST", "disease", "second", "2 disease beta", "D1X", "exact"),
    // non-symbolic shared syn → merged
    OntologyRow("TEST", "disease", "first", "1 disease alpha", "common disease", "exact"),
    OntologyRow("TEST", "disease", "second", "2 disease beta", "common disease", "exact")
  )

  test("buildCandidates groups by syn_norm and splits/merges id sets") {
    val (cands, meta) = ResourceBuild.buildCandidates(rows)
    assert(meta.map(_.idx).sorted == Seq("first", "second"))
    val byNorm = cands.map(c => c.synonymNorm -> c).toMap

    // ambiguous symbol: two distinct default labels → two id sets
    val amb = byNorm("D1X")
    assert(amb.isSymbolic)
    assert(amb.associatedIdSets.size == 2)
    assert(amb.aggregatedBy == IdAggregation.ResolvedBySimilarity)
    assert(amb.isAmbiguous)

    // non-symbolic shared syn → single merged id set
    val merged = byNorm("COMMON DISEASE")
    assert(!merged.isSymbolic)
    assert(merged.associatedIdSets.size == 1)
    assert(merged.aggregatedBy == IdAggregation.MergedAsNonSymbolic)
    assert(merged.associatedIdSets.head.ids.map(_.idx).toSet == Set("first", "second"))

    // unambiguous single-id syn
    val one = byNorm("DISEASE ONE")
    assert(one.associatedIdSets.size == 1)
    assert(one.aggregatedBy == IdAggregation.Unambiguous)
  }

  test("scoreAndGroupIds merges ids with similar default labels") {
    val labels = Map(
      "A:1" -> "paracetamol", "A:2" -> "paracetamol", "A:3" -> "aspirin")
    val (sets, strategy) = ResourceBuild.scoreAndGroupIds(
      Seq(IdAndSource("A:1", "A"), IdAndSource("A:2", "A"), IdAndSource("A:3", "A")),
      isSymbolic = true, labels)
    assert(strategy == IdAggregation.ResolvedBySimilarity)
    assert(sets.size == 2)
    assert(sets.map(_.ids.map(_.idx).toSet).toSet ==
      Set(Set("A:1", "A:2"), Set("A:3")))
  }

  test("findKb extracts source from CURIEs and OBO URIs") {
    assert(ResourceBuild.findKb("MONDO:0004979") == "MONDO")
    assert(ResourceBuild.findKb("http://purl.obolibrary.org/obo/MONDO_0000001") == "MONDO")
    assert(ResourceBuild.findKb("ENSG000001") == "ENSG000001")
  }

  test("defaultResources applies autocuration rules") {
    val (cands, _) = ResourceBuild.buildCandidates(rows)
    val res = ResourceBuild.defaultResources(cands, _ => "disease",
      commonWords = Set("common", "disease"))
    val byNorm = res.map(r => r.synNorm -> r).toMap
    // symbolic → case-sensitive
    assert(byNorm("D1X").synonyms.forall(_.caseSensitive))
    // non-symbolic → case-insensitive
    assert(byNorm("COMMON DISEASE").synonyms.forall(!_.caseSensitive))
    // common words → POSSIBLE confidence
    assert(byNorm("COMMON DISEASE").synonyms.forall(
      _.mentionConfidence == MentionConfidence.Possible))
  }
}

/** Spark-backed reader behavior (OntologySpec proper is session-free). */
class ReadersSparkSpec extends AnyFunSuite with SparkTestBase {

  test("withDefaultLabelSynonyms: explicit synonym's mappingType wins, deterministically") {
    import org.apache.spark.sql.functions.col
    val raw = OntologyReaders.fromRows(spark, Seq(
      // the default label ALSO exists as an explicit synonym row — the
      // planted "defaultLabel" union row must never displace its
      // mappingType (dropDuplicates kept an arbitrary one per partition
      // order, breaking run-to-run determinism)
      OntologyRow("T", "c", "OP:SORT", "sort", "sort", "exactSyn"),
      OntologyRow("T", "c", "OP:SORT", "sort", "ordering", "exactSyn"),
      OntologyRow("T", "c", "OP:MERGE", "merge", "combine", "exactSyn")))
    (1 to 3).foreach { _ =>
      val out = OntologyReaders.withDefaultLabelSynonyms(raw)
        .orderBy(col("idx"), col("syn"))
        .collect()
        .map(r => (r.getString(r.fieldIndex("idx")),
          r.getString(r.fieldIndex("syn")),
          r.getString(r.fieldIndex("mappingType")))).toSeq
      assert(out == Seq(
        ("OP:MERGE", "combine", "exactSyn"),
        ("OP:MERGE", "merge", "defaultLabel"), // planted: label had no explicit row
        ("OP:SORT", "ordering", "exactSyn"),
        ("OP:SORT", "sort", "exactSyn")))      // explicit row wins over planted
    }
  }
}
