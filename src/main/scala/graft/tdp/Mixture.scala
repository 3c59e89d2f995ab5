package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temperature-based corpus mixing — the mT5 / PaLM domain-sampling rule
  * (Raffel/Xue et al.: sample domain d with probability ∝ p_d^α, α = 0.5,
  * boosting low-resource domains): given a document budget B, each domain's
  * target count is B · √n_d / Σ√n_c, realized as a deterministic per-doc
  * keep threshold (the [[TextStats.stratifiedSample]] masked multiplicative
  * hash, ppm-scaled).
  *
  * Cross-engine exactness: p_d^0.5 normalization in floating point would
  * hinge on summation order (a 5-term double sum differs by ulps between
  * engines), so the whole computation stays in integers — q_d =
  * isqrt(n_d · 10^12) (exact integer square root; the 10^12 scaling keeps
  * 6 significant digits of √n even for single-doc domains), denominator
  * and quotas by exact integer division. sqrt only seeds the isqrt; a ±2
  * candidate window absorbs its double error on both engines.
  *
  * Scale shape: one narrow groupBy to domain counts (output = domain
  * cardinality), the quota row set stays distributed (the single-row
  * denominator broadcasts via a cross join — never a driver collect), the
  * per-doc selection is a broadcast-joined threshold filter, and the
  * realized counts are one more partial-aggregated groupBy. Works
  * unchanged whether "domain" is 5 languages or millions of url hosts.
  */
object Mixture {

  /** Exact floor(√x) for x ≥ 0 (double sqrt seeds, Newton corrects). */
  private[graft] def isqrt(x: BigInt): BigInt = {
    require(x >= 0, s"isqrt of negative $x")
    if (x == 0) BigInt(0)
    else {
      var s = BigInt(math.max(1L, math.sqrt(x.doubleValue).toLong))
      while (s * s > x) s = (s + x / s) / 2
      while ((s + 1) * (s + 1) <= x) s += 1
      s
    }
  }

  private val Scale = BigInt(10).pow(12)
  private val Ppm = BigInt(1000000)

  /** One row per domain:
    * (lang, n_docs, weight_ppm, target, threshold_ppm, n_sampled). */
  def temperatureMix(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, lang, ...)
      budget: Long = 200L,
      salt: Long = 17L
  ): DataFrame = {
    import spark.implicits._
    val dq = docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .as[(String, Long)]
      .map { case (l, n) => (l, n, isqrt(BigInt(n) * Scale).toLong) }
      .toDF("lang", "n_docs", "q")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(dq)

    // Σ q as decimal(38,0): exact integer sum, order-free, no driver round
    // trip — the one-row denominator broadcasts into the quota projection
    val denomDf = dq.agg(sum($"q".cast(DecimalType(38, 0))).as("denom"))
    val plan = dq.crossJoin(broadcast(denomDf))
      .as[(String, Long, Long, java.math.BigDecimal)]
      .map { case (l, n, q, d) =>
        val denom = BigInt(d.toBigInteger)
        val weightPpm = (BigInt(q) * Ppm / denom).toLong
        val target = (BigInt(budget) * q / denom).toLong
        val thrPpm = (BigInt(target) * Ppm / BigInt(n)).min(Ppm).toLong
        (l, n, weightPpm, target, thrPpm)
      }
      .toDF("lang", "n_docs", "weight_ppm", "target", "threshold_ppm")
      // plan feeds BOTH the sampling filter and the final join — persist so
      // the denominator aggregation and quota map run once, not per action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(plan)

    // threshold join by domain: a plain equi-join — AQE broadcasts it while
    // the domain table is small (languages) and falls back to a shuffle
    // join when "domain" is millions of url hosts; no forced hint
    val sampled = docs
      .withColumn("_bucket",
        pmod(pmod($"doc_id" + lit(salt), lit(2147483648L)) * lit(2654435761L),
          lit(1000000L)))
      .join(plan.select($"lang", $"threshold_ppm"), Seq("lang"))
      .filter($"_bucket" < $"threshold_ppm")
      .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))

    plan.join(sampled, Seq("lang"), "left")
      .select($"lang", $"n_docs", $"weight_ppm", $"target", $"threshold_ppm",
        coalesce($"n_sampled", lit(0L)).as("n_sampled"))
      .orderBy($"lang")
  }
}
