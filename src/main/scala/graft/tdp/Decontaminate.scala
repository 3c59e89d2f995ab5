package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag corpus documents that share any
  * word n-gram (default 13 — the GPT-3/PaLM decontamination window) with
  * an evaluation-benchmark corpus, so eval material can be excluded from
  * training data.
  *
  * Scale shape — two paths, chosen by a COUNT of the benchmark n-gram set
  * before anything reaches the driver:
  *
  *  - broadcast (the common case): real eval suites are at most millions
  *    of n-grams, so the distinct set ships as ONE broadcast and the
  *    corpus pass is a single narrow map — no shuffle anywhere.
  *  - sharded equi-join (the fallback — no ceiling): above the broadcast
  *    bound the benchmark set stays distributed and the corpus's
  *    per-document distinct n-grams equi-join it on the n-gram key, then
  *    re-aggregate per doc_id. The join is a DIRECT shuffle join (not
  *    aggregate-fed), so AQE's skew-split applies to any hot boilerplate
  *    n-gram; nothing is ever collected.
  *
  * At production scale the join key would be a 64-bit n-gram hash (8 B)
  * instead of the string; the string form keeps the DuckDB oracle a pure
  * relational replay (the FNV hash is also SQL-replicable — see
  * OracleSql's HUGEINT kernels — but adds nothing to the semantics).
  */
object Decontaminate {

  /** Word `n`-grams of a token array (all positions). */
  def ngrams(words: Array[String], n: Int): Iterator[String] =
    if (words.length < n) Iterator.empty
    else (0 to words.length - n).iterator.map(i => words.slice(i, i + n).mkString(" "))

  /** Per-document contamination counts vs a benchmark table.
    *
    * @param docs      (doc_id, text)
    * @param benchmark (bench_text) — the eval corpus
    * @param broadcastNgramBound benchmark n-gram sets at or under this
    *        size are collected + broadcast; larger sets take the join path
    * @return (doc_id, n_contaminated_ngrams = distinct benchmark n-grams
    *         present in the doc, contaminated)
    */
  def flagContaminated(
      spark: SparkSession,
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 13,
      broadcastNgramBound: Long = 5_000_000L
  ): DataFrame = {
    import spark.implicits._
    val benchNgrams = benchmark
      .select(split(col("bench_text"), " ").as("words"))
      .as[Array[String]]
      .flatMap(ngrams(_, n))
      .distinct()
      // persisted across the bound-check count and whichever path follows
      // (the collect, or the join's probe side) — one derivation, not two
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (benchNgrams.count() <= broadcastNgramBound) {
      // the count above bounds the set BEFORE any driver materialization
      val bc = spark.sparkContext.broadcast(benchNgrams.collect().toSet)
      benchNgrams.unpersist()
      docs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val set = bc.value
          var hits = 0
          val seen = scala.collection.mutable.HashSet.empty[String]
          // -1 limit: keep trailing empty tokens, matching the Spark SQL
          // split on the benchmark side and string_split in the oracle
          ngrams(text.split(" ", -1), n).foreach { g =>
            if (set.contains(g) && seen.add(g)) hits += 1
          }
          (id, hits.toLong, hits > 0)
        }
        .toDF("doc_id", "n_contaminated_ngrams", "contaminated")
        .orderBy(col("doc_id"))
    } else {
      // join path: the persisted set stays distributed (caller releases it
      // via CacheRegistry once the returned plan materializes); per-doc
      // DISTINCT n-grams emitted locally so the join counts each (doc,
      // gram) pair once — identical semantics to the broadcast path
      graft.util.CacheRegistry.register(benchNgrams)
      val docGrams = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val seen = scala.collection.mutable.LinkedHashSet.empty[String]
          ngrams(text.split(" ", -1), n).foreach(seen.add)
          seen.iterator.map(g => (id, g))
        }
        .toDF("doc_id", "ngram")
      val hits = docGrams
        .join(benchNgrams.toDF("ngram"), "ngram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"))
      docs.select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_contaminated_ngrams"),
          (coalesce(col("n"), lit(0L)) > 0).as("contaminated"))
        .orderBy(col("doc_id"))
    }
  }
}
