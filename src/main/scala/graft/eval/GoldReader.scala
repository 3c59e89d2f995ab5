package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-annotation source (ref SURVEY.md A5: Label Studio task JSON ↔
  * documents, kazu/annotation/label_studio.py:31-465). Test-only reader:
  * parses a Label-Studio-style export into the gold_entities shape of
  * FIXTURES.md §4 for the acceptance join.
  *
  * Export shape consumed:
  * [{"data": {"url": ..., "text": ...},
  *   "annotations": [{"result": [{"value": {"start": s, "end": e,
  *     "labels": ["class"], "text": "match"}, "meta": {"mapping_id": ...,
  *     "source": ...}}]}]}]
  */
object GoldReader {

  def fromLabelStudioJson(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    raw
      .select(col("data.url").as("url"),
        explode(col("annotations")).as("ann"))
      .select(col("url"), explode(col("ann.result")).as("r"))
      .select(
        col("url"),
        col("r.value.start").cast("int").as("start"),
        col("r.value.end").cast("int").as("end"),
        col("r.value.text").as("match"),
        element_at(col("r.value.labels"), 1).as("entity_class"),
        col("r.meta.source").as("source"),
        col("r.meta.mapping_id").as("mapping_id"))
      .filter(col("start").isNotNull && col("entity_class").isNotNull)
  }

  /** Parse a REFERENCE-shaped Label Studio export verbatim — the task JSON
    * the reference's `export_from_ls` consumes (kazu/annotation/
    * label_studio.py:195-337): `data.id` = "<docid>_<section>_<i>", one
    * annotation set, `result` regions of three kinds — NER regions
    * (`type: labels`), taxonomy regions carrying mappings as
    * `(source, "default_label|idx")` pairs, and `relation` links that glue
    * non-contiguous spans into one entity. Reconstruction mirrors
    * `LSToKazuConversion.create_ents` exactly: one entity per
    * (contiguous region × label); non-contig pairs merge with
    * match = "<to-text> <from-text>", label INTERSECTION, mapping UNION;
    * the unmapped sentinel `("None", "unmapped|unmapped")` is kept as a
    * mapping row like the reference does. One output row per gold entity:
    * (doc_id, entity_class, match, starts, ends, mappings) with `mappings`
    * an array of (source, idx) structs — the PAIRING the reference's
    * Mapping-set union preserves (two independently-distinct arrays would
    * conflate {(test1,1),(test2,2)} with {(test1,2),(test2,1)}).
    * The committed fixture `ls_reference_export.json` is generated and
    * round-trip-validated by the reference's own converter
    * (tools/make_ls_fixture.py). */
  def fromReferenceExport(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val results = raw.select(
        col("data.id").as("data_id"),
        // the reference uses only the FIRST annotation set (:206-207)
        element_at(col("annotations"), 1).as("ann"))
      .select(
        split(col("data_id"), "_").getItem(0).as("doc_id"),
        explode(col("ann.result")).as("r"))
    val ner = results.filter(col("r.type") === "labels").select(
      col("doc_id"), col("r.id").as("rid"),
      col("r.value.start").cast("int").as("start"),
      col("r.value.end").cast("int").as("end"),
      col("r.value.text").as("match"),
      // ref iterates every label of the region (create_ents :275-277)
      explode(col("r.value.labels")).as("entity_class"))
    val mappings = results.filter(col("r.type") === "taxonomy")
      .select(col("doc_id"), col("r.id").as("rid"),
        explode(col("r.value.taxonomy")).as("t"))
      .select(col("doc_id"), col("rid"),
        element_at(col("t"), 1).as("source"),
        element_at(split(element_at(col("t"), 2), "\\|"), -1).as("mapping_idx"))
      .groupBy(col("doc_id"), col("rid"))
      // (source, idx) kept as PAIRED structs, distinct + sorted — set-of-
      // Mapping semantics for both the contiguous and merged row shapes
      .agg(sort_array(array_distinct(collect_list(
        struct(col("source"), col("mapping_idx").as("idx"))))).as("mappings"))
    val rel = results.filter(col("r.type") === "relation").select(
      col("doc_id"), col("r.from_id").as("from_id"), col("r.to_id").as("to_id"))
    val regions = ner.join(mappings, Seq("doc_id", "rid"), "left")
    val linkedIds = rel.select(col("doc_id"), col("from_id").as("rid"))
      .union(rel.select(col("doc_id"), col("to_id").as("rid"))).distinct()
    val emptyMappings =
      array().cast("array<struct<source:string,idx:string>>")
    val contiguous = regions.join(linkedIds, Seq("doc_id", "rid"), "left_anti")
      .select(col("doc_id"), col("entity_class"), col("match"),
        array(col("start")).as("starts"), array(col("end")).as("ends"),
        coalesce(col("mappings"), emptyMappings).as("mappings"))
    val fromSide = regions.toDF(regions.columns.map("f_" + _): _*)
    val toSide = regions.toDF(regions.columns.map("t_" + _): _*)
    val nonContig = rel
      .join(fromSide, col("doc_id") === col("f_doc_id") && col("from_id") === col("f_rid"))
      .join(toSide, col("doc_id") === col("t_doc_id") && col("to_id") === col("t_rid") &&
        // label intersection (:287)
        col("f_entity_class") === col("t_entity_class"))
      .select(col("doc_id"), col("f_entity_class").as("entity_class"),
        // match = "<to-text> <from-text>" (:288)
        concat(col("t_match"), lit(" "), col("f_match")).as("match"),
        array(col("f_start"), col("t_start")).as("starts"),
        array(col("f_end"), col("t_end")).as("ends"),
        // mapping UNION across the linked regions (:291-293) — pairwise,
        // on the (source, idx) structs
        sort_array(array_distinct(concat(
          coalesce(col("f_mappings"), emptyMappings),
          coalesce(col("t_mappings"), emptyMappings)))).as("mappings"))
    contiguous.unionByName(nonContig)
      .orderBy(col("doc_id"), col("entity_class"), col("match"))
  }

  /** CSV golden shape committed by the reference
    * (kazu/tests/test_assets/full_pipeline/{0,1,2}.csv). */
  def fromReferenceCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)
      .select(
        col("namespace"),
        col("match"),
        col("entity_class"),
        col("start").cast("int").as("start"),
        col("end").cast("int").as("end"),
        col("mapping_id"))
}
