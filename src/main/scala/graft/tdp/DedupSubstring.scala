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
    val clean = postings.join(broadcast(blacklist), Seq("f"), "left_anti")
    // r8: pair generation in-row instead of a fingerprint self-join — the
    // anti-join already bounds every surviving posting list at maxPosting,
    // so collect_list per fingerprint holds ≤ 20 ids (bounded state, no
    // hot key) and the sorted id list emits each (a < b) pair exactly once
    // via codegen'd higher-order functions; the self-join's second shuffle
    // of the posting table is gone
    clean.groupBy($"f")
      .agg(sort_array(collect_list($"doc_id")).as("ds"))
      .filter(size($"ds") >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds) - i - 1), y -> " +
          "named_struct('doc_a', x, 'doc_b', y))))")).as("p"))
      .select($"p.doc_a".as("doc_a"), $"p.doc_b".as("doc_b"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter($"n_shared" >= minShared)
      .orderBy($"doc_a", $"doc_b")
  }
}
