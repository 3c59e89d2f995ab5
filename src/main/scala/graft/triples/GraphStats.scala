package graft.triples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-side aggregations over the triples table with explicit hot-key
  * skew handling (north rule: "salted shuffles for hot-entity skew").
  *
  * A per-OBJECT aggregation is the skew point of a KG at web scale: one
  * entity ("cancer") can appear in a large fraction of 10^12 pages, so a
  * plain `groupBy(obj)` puts that key's entire traffic on one reducer.
  * Two defenses compose here:
  *
  *  1. **salting**: partial-aggregate on (obj, salt = hash(subj) % S),
  *     then final-aggregate on obj — the hot key fans out over S reducers
  *     and the second shuffle carries only S rows per key;
  *  2. **distinct-first for count-distinct**: `COUNT(DISTINCT url)` per obj
  *     is computed by de-duplicating (obj, url) pairs first — that shuffle
  *     keys on the PAIR, which is well-distributed even when obj is hot.
  *
  * (AQE skew-join splitting handles the join-side analogue automatically;
  * salting is the aggregation-side defense that must be explicit.)
  */
object GraphStats {

  def saltedObjectCounts(
      spark: SparkSession,
      triples: DataFrame,
      saltBuckets: Int = 16
  ): DataFrame = {
    import spark.implicits._
    val partial = triples
      .withColumn("_salt", pmod(hash($"subj"), lit(saltBuckets)))
      .groupBy($"pred", $"obj", $"_salt")
      .agg(count(lit(1)).as("_partial"))
    val mentions = partial
      .groupBy($"pred", $"obj")
      .agg(sum($"_partial").as("n_mentions"))
    val docs = triples
      .select($"pred", $"obj", $"url")
      .distinct() // shuffle keyed on the well-distributed (pred,obj,url)
      .groupBy($"pred", $"obj")
      .agg(count(lit(1)).as("n_docs"))
    mentions.join(docs, Seq("pred", "obj"))
      .orderBy($"pred", $"obj")
  }

  /** Entity co-occurrence edges: for every pair of distinct entities
    * mentioned in the same document, the number of co-mentioning documents.
    *
    * Scale shape: the self-join keys on the well-distributed `url`, never on
    * the hot `obj` — but an unbounded per-document pair explosion is its own
    * skew: a directory-style page mentioning 10^4 entities alone emits
    * ~5*10^7 pairs. So distinct objs are capped per document at
    * `maxObjsPerDoc` (top-N by mention count, obj tiebreak) BEFORE the
    * self-join, bounding per-doc fanout at N^2/2. Truncation is surfaced
    * through the Spark `observe` metric `n_truncated_doc_objs` (observation
    * name "cooccurrence_cap"), so a production run logs how many (url, obj)
    * rows the cap dropped instead of silently narrowing the graph.
    */
  def cooccurrenceEdges(
      spark: SparkSession,
      triples: DataFrame,
      maxObjsPerDoc: Int = 64
  ): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perDoc = triples
      .groupBy($"url", $"obj")
      .agg(count(lit(1)).as("_n_mentions"))
    val w = Window.partitionBy($"url").orderBy($"_n_mentions".desc, $"obj")
    val capped = perDoc
      .withColumn("_rn", row_number().over(w))
      .observe("cooccurrence_cap",
        count(when($"_rn" > maxObjsPerDoc, true)).as("n_truncated_doc_objs"))
      .filter($"_rn" <= maxObjsPerDoc)
      .select($"url", $"obj")
    val a = capped.toDF("url", "obj_a")
    val b = capped.toDF("url", "obj_b")
    a.join(b, Seq("url"))
      .filter($"obj_a" < $"obj_b")
      .groupBy($"obj_a", $"obj_b")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"obj_a", $"obj_b")
  }
}
