package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring-anchored near-duplicate detection — the exact-substring dedup
  * flavor of training-data pipelines (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"): two documents that share
  * long verbatim character runs are flagged even when their word-level
  * Jaccard is low (quotes, boilerplate, partially-copied pages).
  * This is the document-PAIR scoring flavor; [[SubstringSpans]] implements
  * the published tool's full span-level removal semantics.
  *
  * Mechanism: the winnowed Rabin–Karp 16-gram fingerprints
  * ([[TextStats.fingerprints]] — already the doc_fingerprint sketch) act as
  * shared-substring anchors; a fingerprint common to two documents is a
  * shared 16-char run (mod hash collisions, vanishing at 64 bits), and
  * documents sharing ≥ `minShared` anchors are substring near-dups, scored
  * by their shared-anchor count.
  *
  * Scale shape (the minhash lessons applied):
  *  - postings are (fingerprint, doc_id) pairs — 16 bytes into the
  *    shuffle, never text;
  *  - the posting table is persisted ONCE and feeds both the occupancy
  *    count and the join (caller releases via CacheRegistry);
  *  - mega-postings (a boilerplate substring present corpus-wide) are
  *    dropped via broadcast LEFT ANTI join against the tiny blacklist —
  *    never an inner join against the keep-list, and never a hot-key
  *    self-join (the r4 SKEW.md finding);
  *  - the capped self-join is bounded at `maxPosting²` rows per
  *    fingerprint.
  */
object DedupSubstring {

  def substringPairs(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text)
      minShared: Int = 2,
      maxPosting: Long = 20L
  ): DataFrame = {
    import spark.implicits._
    val postings = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        TextStats.fingerprints(t).distinct.iterator.map(f => (f, id))
      }
      .toDF("f", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(postings)
    val blacklist = postings.groupBy($"f")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > maxPosting)
      .select($"f")
    // self-join form kept deliberately (r8): an in-row collect_list pair
    // generation was tried and measured SLOWER — fingerprint keys number
    // ~|postings|, so ObjectHashAggregate exceeds its 128-key in-memory
    // threshold and falls back to sort-based aggregation, while the
    // self-join's two branches reuse one exchange
    val clean = postings.join(broadcast(blacklist), Seq("f"), "left_anti")
    val left = clean.toDF("f", "doc_a")
    val right = clean.toDF("f", "doc_b")
    left.join(right, "f")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .orderBy($"doc_a", $"doc_b")
  }
}
