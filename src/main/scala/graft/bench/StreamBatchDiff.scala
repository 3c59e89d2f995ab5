package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming↔batch contract at data scale (round-5 directive #9): replay a
  * corpus as micro-batches through the stateful streaming dedup operators
  * and diff their flagged sets against the batch operators on the same
  * data. The spec-scale cross-checks (StreamingSpec) pin semantics; this
  * main pins them at sf1 (50k docs, real duplicate structure from the
  * key-shifted replication) and writes the committed artifact.
  *
  * Contracts checked:
  *  - exact dedup: per content-hash CLUSTER, streaming must see exactly one
  *    first-occurrence and a max occurrence number equal to the batch
  *    cluster size (the canonical CHOICE is policy — arrival order vs
  *    min-key — so the contract is cluster-level, not row-level);
  *  - near-dup: the streaming LSH index (uncapped buckets, same bands/
  *    threshold) must emit EXACTLY the batch pair set with equal estimated
  *    Jaccard per pair — banding, signatures, and verification all shared
  *    kernels, so any divergence is a real state-machine bug.
  *
  * The driver-side collect feeds MemoryStream (its API is driver-side by
  * design); this is a validation harness, not a production path.
  */
object StreamBatchDiff {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf1")
    val out = args.lift(1).getOrElse("/root/repo/STREAMBATCH.md")
    val microBatch = args.lift(2).map(_.toInt).getOrElse(5000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docsDf = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val docs = docsDf.as[(Long, String)].collect().sortBy(_._1)
    val nDocs = docs.length
    val batches = docs.grouped(microBatch).toSeq

    // ---- streaming side ---------------------------------------------------
    val dedupIn = MemoryStream[(String, String)]
    val dedupQ = graft.streaming.StreamingPipeline
      .dedupStream(spark, dedupIn.toDF().toDF("url", "text"))
      .writeStream.format("memory").queryName("sb_dedup")
      .outputMode("append").start()
    batches.foreach { chunk =>
      dedupIn.addData(chunk.map { case (id, t) => (id.toString, t) })
      dedupQ.processAllAvailable()
    }
    dedupQ.stop()
    val streamDedup = spark.table("sb_dedup")
      .select($"url".cast("long").as("doc_id"), $"textMd5", $"isFirstSeen",
        $"nOccurrence")
      .as[(Long, String, Boolean, Long)].collect()

    val nearIn = MemoryStream[(String, String)]
    val nearQ = graft.streaming.StreamingPipeline
      .nearDupStream(spark, nearIn.toDF().toDF("url", "text"),
        maxBucket = Int.MaxValue)
      .writeStream.format("memory").queryName("sb_near")
      .outputMode("append").start()
    batches.foreach { chunk =>
      nearIn.addData(chunk.map { case (id, t) => (id.toString, t) })
      nearQ.processAllAvailable()
    }
    nearQ.stop()
    // at-least-once per band → a pair may be emitted several times, but
    // every emission MUST carry the same similarity. Check that BEFORE
    // collapsing: a last-write-wins .toMap would silently hide exactly the
    // contradictory-emission state bug this harness exists to catch.
    val streamEmissions = spark.table("sb_near")
      .select($"url".cast("long").as("a"), $"matchedUrl".cast("long").as("b"),
        $"estJaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (math.min(a, b), math.max(a, b)) -> s }
    val contradictory = streamEmissions.groupBy(_._1)
      .collect { case (p, es) if es.map(_._2).distinct.length > 1 =>
        s"pair $p emitted with ${es.map(_._2).distinct.length} distinct sims: " +
          es.map(_._2).distinct.mkString(", ") }
      .toSeq
    val streamPairs = streamEmissions.toMap

    // ---- batch side -------------------------------------------------------
    val batchClusters = docsDf
      .select($"doc_id", md5(to_binary($"text", lit("utf-8"))).as("text_md5"))
      .groupBy($"text_md5").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val batchPairs = graft.tdp.Dedup.minhashPairs(spark, docsDf)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    graft.util.CacheRegistry.releaseAll()

    // ---- diff -------------------------------------------------------------
    val byHash = streamDedup.groupBy(_._2)
    val dedupDivergences = scala.collection.mutable.ArrayBuffer.empty[String]
    if (byHash.size != batchClusters.size)
      dedupDivergences += s"cluster count ${byHash.size} != ${batchClusters.size}"
    byHash.foreach { case (h, rows) =>
      val firsts = rows.count(_._3)
      val maxOcc = rows.map(_._4).max
      val expected = batchClusters.getOrElse(h, -1L)
      if (firsts != 1) dedupDivergences += s"$h: $firsts first-seen rows"
      if (maxOcc != expected || rows.length != expected)
        dedupDivergences += s"$h: stream ${rows.length}/max $maxOcc vs batch $expected"
    }

    val pairDivergences = scala.collection.mutable.ArrayBuffer.empty[String]
    contradictory.take(5).foreach(pairDivergences += _)
    (streamPairs.keySet diff batchPairs.keySet).take(5)
      .foreach(p => pairDivergences += s"stream-only pair $p")
    (batchPairs.keySet diff streamPairs.keySet).take(5)
      .foreach(p => pairDivergences += s"batch-only pair $p")
    if (streamPairs.size == batchPairs.size)
      streamPairs.foreach { case (p, s) =>
        if (batchPairs.get(p).exists(_ != s))
          pairDivergences += s"$p: sim $s vs ${batchPairs(p)}"
      }

    val report =
      s"""# STREAMBATCH — streaming↔batch contract at data scale (round 5)
         |
         |Input: `$dir` ($nDocs docs), replayed as ${batches.size} micro-batches
         |of $microBatch through `dedupStream` and `nearDupStream`
         |(uncapped buckets), then diffed against the batch operators on the
         |same data. Regenerate: `sbt "runMain graft.bench.StreamBatchDiff"`.
         |
         || contract | streaming | batch | divergences |
         ||---|---|---|---|
         || exact-dup clusters (per-md5 size + single first-seen) | ${byHash.size} clusters / ${streamDedup.length} rows | ${batchClusters.size} clusters | ${dedupDivergences.size} |
         || near-dup pairs (pair set + est. Jaccard per pair) | ${streamPairs.size} pairs | ${batchPairs.size} pairs | ${pairDivergences.size} |
         |
         |${if (dedupDivergences.isEmpty && pairDivergences.isEmpty)
            "**0 divergences** — the incremental LSH index and the stateful " +
            "exact dedup reproduce the batch operators' decisions exactly at sf1."
          else
            "DIVERGENCES FOUND:\n" +
            (dedupDivergences ++ pairDivergences).take(20).mkString("\n")}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), report)
    println(report)
    assert(dedupDivergences.isEmpty && pairDivergences.isEmpty,
      "streaming/batch divergences found")
    spark.stop()
  }
}
