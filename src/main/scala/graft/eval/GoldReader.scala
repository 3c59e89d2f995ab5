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
