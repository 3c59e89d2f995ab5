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
}
