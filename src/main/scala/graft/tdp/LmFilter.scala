package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Language-model quality filtering — the CCNet idea (Wenzek et al. 2020:
  * rank pages by LM perplexity, keep the low-perplexity head) with the
  * corpus's own unigram model and EXACT integer surprisal:
  *
  *   surprisal(w) = ilog2(T) − ilog2(c_w)   (whole bits, floor-log2)
  *
  * where c_w is the corpus frequency of w and T the total token count.
  * ilog2 = floor(log2) is exact integer arithmetic on both engines (bit
  * length − 1: `63 − numberOfLeadingZeros` here, `length(bin(x)) − 1` in
  * DuckDB) — deliberately NOT float ln/log2, whose last-ulp behavior is
  * engine-specific and would break the hash-exact oracle gate (the same
  * reasoning as [[Mixture]]'s isqrt quotas). Whole-bit quantization costs
  * <1 bit/token of resolution against the real unigram surprisal — far
  * inside the head/tail separation the filter exists to make.
  *
  * Self-trained: the model counts come from the corpus being filtered
  * (CCNet trains on a reference corpus; a one-line swap of `counts`), so
  * every token is in-vocabulary and no smoothing branch is needed.
  *
  * Scale shape: one exploded (doc_id, word) pass feeds BOTH the count
  * model and the scoring join (persisted once); the model is one row per
  * DISTINCT word — never broadcast (web-scale vocabularies don't fit), a
  * plain shuffle equi-join where a hot word fans 1:1 with its occurrences
  * (AQE splits the skewed partitions); per-doc totals are one
  * partial-aggregated groupBy. The single-row total rides a cross join
  * broadcast like [[Mixture]]'s denominator.
  */
object LmFilter {

  private[graft] def ilog2(x: Long): Int = {
    require(x > 0, s"ilog2 of $x")
    63 - java.lang.Long.numberOfLeadingZeros(x)
  }

  /** One row per document:
    * (doc_id, n_tokens, total_bits, mean_bits_x100, lm_keep). */
  def surprisal(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text)
      keepMeanBitsX100: Long = 505L
  ): DataFrame = {
    import spark.implicits._
    // r8: persist the VOCABULARY-sized counts table, not the corpus-sized
    // exploded token table — the round-7 shape cached one row per token
    // (at 100 TB that is MORE bytes than the corpus itself in
    // MEMORY_AND_DISK) to avoid recomputing the narrow token flatMap; the
    // flatMap is a scan-speed narrow stage and recomputing it once for the
    // scoring join is strictly cheaper than materializing the token table.
    // The model total then comes from the persisted counts (one tiny
    // aggregate), not from a second corpus-wide pass.
    val words = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        t.split(" ").iterator.filter(_.nonEmpty).map(w => (id, w))
      }
      .toDF("doc_id", "word")

    val counts = graft.util.CacheRegistry.register(
      words.groupBy($"word").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totalDf = counts.agg(sum($"c").as("total"))

    words
      .join(counts, Seq("word"))
      .crossJoin(broadcast(totalDf))
      .as[(String, Long, Long, Long)] // (word, doc_id, c, total)
      .map { case (_, id, c, total) => (id, ilog2(total) - ilog2(c)) }
      .toDF("doc_id", "bits")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"bits").as("total_bits"))
      // integral `div`, not `/`: float division + cast would round through
      // a DOUBLE and can disagree with the oracle's integer floor division
      .select($"doc_id", $"n_tokens", $"total_bits",
        expr("total_bits * 100 div n_tokens").as("mean_bits_x100"))
      .withColumn("lm_keep", $"mean_bits_x100" <= keepMeanBitsX100)
      .orderBy($"doc_id")
  }
}
