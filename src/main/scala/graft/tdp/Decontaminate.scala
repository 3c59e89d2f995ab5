package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag corpus documents that share any
  * word n-gram (default 13 — the GPT-3/PaLM decontamination window) with
  * an evaluation-benchmark corpus, so eval material can be excluded from
  * training data.
  *
  * Scale shape: the benchmark side is tiny relative to a 10^12-page corpus
  * (eval suites are at most millions of n-grams), so its distinct n-gram
  * set ships as ONE broadcast and the corpus pass is a single narrow map —
  * no shuffle anywhere, scan-bound like text_quality. At production scale
  * the broadcast would carry 64-bit n-gram hashes (8 B each) instead of
  * strings; the string form here keeps the DuckDB oracle a pure relational
  * replay (the FNV hash is also SQL-replicable — see OracleSql's HUGEINT
  * kernels — but adds nothing to the semantics being checked).
  */
object Decontaminate {

  /** Distinct word `n`-grams of a token array. */
  def ngrams(words: Array[String], n: Int): Iterator[String] =
    if (words.length < n) Iterator.empty
    else (0 to words.length - n).iterator.map(i => words.slice(i, i + n).mkString(" "))

  /** Per-document contamination counts vs a benchmark table.
    *
    * @param docs      (doc_id, text)
    * @param benchmark (bench_text) — the eval corpus (small; collected +
    *                  broadcast: `require`d under `maxBenchmarkNgrams`)
    * @return (doc_id, n_contaminated_ngrams = distinct benchmark n-grams
    *         present in the doc, contaminated)
    */
  def flagContaminated(
      spark: SparkSession,
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int = 13,
      maxBenchmarkNgrams: Long = 50_000_000L
  ): DataFrame = {
    import spark.implicits._
    val benchArr = benchmark
      .select(split(col("bench_text"), " ").as("words"))
      .as[Array[String]]
      .flatMap(ngrams(_, n))
      .distinct()
      .collect() // one job; the bound is enforced on the collected size
    require(benchArr.length <= maxBenchmarkNgrams,
      s"benchmark n-gram set (${benchArr.length}) exceeds the broadcastable " +
        s"bound ($maxBenchmarkNgrams); shard the benchmark or raise the bound")
    val bc = spark.sparkContext.broadcast(benchArr.toSet)
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
  }
}
