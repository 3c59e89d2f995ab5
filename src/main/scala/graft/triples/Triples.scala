package graft.triples

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

/** Entity → (subj, pred, obj) assembly (FIXTURES.md §5): the KG output plane.
  *
  * subj = url#start-end (the mention anchor), pred = "mentions_<class>",
  * obj = source:idx (the grounded Mapping, ref kazu/data/__init__.py:174-195).
  *
  * Production sink: Iceberg `triples` table PARTITIONED BY (pred,
  * bucket(64, subj)) written with fanout; the `pred` space is tiny (one per
  * entity class) and subj bucketing spreads the url keyspace evenly, so no
  * single partition is hot even when one entity class dominates. Downstream
  * per-OBJECT aggregations are where hot-entity skew lives ("cancer"
  * appears everywhere): those aggregate with partial (map-side) combine and
  * AQE skew splitting — see GraphStats for the salted two-phase pattern.
  */
object Triples {

  /** Graph-table writer: partitioned by predicate (tiny cardinality — one
    * per entity class) and bucketed on subj, so (a) per-predicate scans
    * prune, and (b) subj-keyed self-joins / point lookups co-locate without
    * a shuffle. This is the `PARTITIONED BY (pred, bucket(64, subj))`
    * Iceberg layout of FIXTURES.md §5 expressed through the catalog writer.
    */
  def writeBucketed(
      spark: SparkSession,
      triples: Dataset[Triple],
      tableName: String,
      buckets: Int = 16
  ): Unit =
    triples.toDF()
      .write.mode("overwrite")
      .format("parquet")
      .partitionBy("pred")
      .bucketBy(buckets, "subj")
      .sortBy("subj")
      .saveAsTable(tableName)

  def fromDocs(spark: SparkSession, docs: Dataset[KDoc]): Dataset[Triple] = {
    import spark.implicits._
    docs.flatMap(fromDoc _)
  }

  /** Per-document triple rows — the flatMap kernel of [[fromDocs]], exposed
    * so streaming consumers can pair triples with doc-level fields (e.g.
    * event time) WITHOUT a stream-stream join back to the page stream. */
  def fromDoc(doc: KDoc): Iterator[Triple] = {
    {
      if (doc.error.isDefined) Iterator.empty
      else
        for {
          section <- doc.sections.iterator
          e <- section.entities.iterator
          m <- e.mappings.iterator
        } yield Triple(
          subj = s"${doc.url}#${e.start}-${e.end}",
          pred = s"mentions_${e.entityClass}",
          // idx already carries its source prefix for CURIE-style ids
          obj = if (m.idx.startsWith(m.source + ":")) m.idx
                else s"${m.source}:${m.idx}",
          confidence = m.stringMatchConfidence,
          namespace = e.namespace,
          matchStr = e.matchStr,
          start = e.start,
          end = e.end,
          url = doc.url
        )
    }.iterator
  }
}
