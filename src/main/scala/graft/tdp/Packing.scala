package graft.tdp

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-sequence packing — the GPT-style "concatenate and cut" layout
  * (Brown et al. 2020 pack documents back-to-back with an end-of-document
  * separator and cut fixed-length training sequences, letting documents
  * cross sequence boundaries): every document, in doc_id order, contributes
  * its token count plus one separator token; the concatenated stream is cut
  * every `capacity` tokens; the output describes each training sequence
  * (how many documents touch it, the first/last of them, and its fill —
  * `capacity` everywhere except the tail).
  *
  * The naive formulation is a running total over the whole corpus —
  * `sum(n) OVER (ORDER BY doc_id)` — which Spark executes as a SINGLE-TASK
  * window (no partition key): the one shape every other operator here
  * avoids. The scale shape is the classic two-phase distributed scan:
  *
  *  1. range-partition by doc_id and sort within partitions — partition i
  *     holds a contiguous doc_id range below partition i+1's;
  *  2. pass A: one (partitionId, tokenSum) row per partition — the ONLY
  *     driver-side materialization, bounded by the partition count (a few
  *     thousand rows on a real cluster), never by corpus size;
  *  3. the exclusive per-partition prefix is broadcast back;
  *  4. pass B re-reads the SAME persisted partitions and assigns every
  *     document its global token offset with a local running sum.
  *
  * A document at offset o with n tokens overlaps sequences
  * floor(o/C)..floor((o+n-1)/C) — membership explodes to at most
  * ceil(n/C)+1 rows per document, then a plain partial-aggregated groupBy
  * per sequence. No global window, no unbounded state, no skew surface
  * (sequence ids are uniform by construction).
  *
  * Tokens = whitespace words (the engine's token-counting convention) + 1
  * end-of-document separator; swapping in BPE counts ([[graft.text.Bpe]])
  * is a drop-in change of the `tokens` function.
  */
object Packing {

  private[graft] def tokenCount(text: String): Long =
    text.split(" ").count(_.nonEmpty).toLong + 1L // + end-of-doc separator

  /** One row per training sequence:
    * (chunk_id, n_docs, first_doc, last_doc, n_tokens).
    *
    * NOTE (ADVICE r7): constructing this DataFrame is EAGER — pass A
    * (persist + per-partition token sums, a driver array bounded by the
    * PARTITION count, never by data) runs a Spark job at construction time
    * and registers the token-count persist with [[graft.util.CacheRegistry]],
    * unlike the other lazily-built SparkEntry queries. Callers that only
    * want the plan still pay pass A once. */
  def packSequences(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text)
      capacity: Long = 256L
  ): DataFrame = {
    import spark.implicits._
    require(capacity > 0, s"capacity must be positive, got $capacity")

    val toks = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, tokenCount(t)) }
      .toDF("doc_id", "n")
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(toks)

    // pass A: per-partition token sums — one row per partition on the
    // driver (bounded by parallelism, not data)
    val sums = toks.as[(Long, Long)]
      .mapPartitions { it =>
        Iterator.single((TaskContext.getPartitionId(), it.map(_._2).sum))
      }
      .collect()
    val nParts = sums.map(_._1).maxOption.getOrElse(-1) + 1
    val prefix = new Array[Long](math.max(nParts, 1))
    var acc = 0L
    sums.sortBy(_._1).foreach { case (pid, s) => prefix(pid) = acc; acc += s }
    val total = acc
    val bcPrefix = spark.sparkContext.broadcast(prefix)

    // pass B: same persisted partitions, local running sum from the
    // broadcast exclusive prefix -> every doc's global token offset
    val members = toks.as[(Long, Long)]
      .mapPartitions { it =>
        var run = bcPrefix.value(TaskContext.getPartitionId())
        it.flatMap { case (id, n) =>
          val off = run
          run += n
          (off / capacity to (off + n - 1) / capacity).iterator
            .map(c => (c, id))
        }
      }
      .toDF("chunk_id", "doc_id")

    members.groupBy($"chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("first_doc"),
        max($"doc_id").as("last_doc"))
      .withColumn("n_tokens",
        least(lit(total), ($"chunk_id" + 1) * capacity) - $"chunk_id" * capacity)
      .select($"chunk_id", $"n_docs", $"first_doc", $"last_doc", $"n_tokens")
      .orderBy($"chunk_id")
  }
}
