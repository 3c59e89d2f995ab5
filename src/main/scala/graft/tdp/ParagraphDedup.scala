package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level deduplication (the CCNet shape: boilerplate
  * paragraphs — cookie banners, nav text, legal footers — repeat across
  * millions of pages, and the unit of removal is the paragraph, not the
  * document). Per document: how many of its paragraphs appear elsewhere in
  * the corpus (or repeat within it), and a keep flag at the 0.3
  * duplicate-paragraph-fraction threshold.
  *
  * Scale shape:
  *  - paragraphs ship into the shuffle as 16-byte md5 keys, never text;
  *  - one hash-groupBy with map-side partial aggregation;
  *  - the count join-back goes through the shared [[Dedup.saltedJoinBack]]
  *    — a corpus-wide boilerplate paragraph is EXACTLY the hot key that
  *    would otherwise pin one reducer (the r4 SKEW.md finding), and the
  *    16-way salt bounds it independent of broadcast thresholds.
  *
  * Paragraph structure comes from [[Gopher.structure]] (deterministic
  * 8-word lines / 3-line paragraphs on this single-line corpus; real
  * multi-line corpora would split on '\n\n'), so the DuckDB oracle reuses
  * the same structure derivation.
  */
object ParagraphDedup {

  def paragraphDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val paras = docs.select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, t) =>
        Gopher.structure(t).paras.iterator.zipWithIndex
          .map { case (p, i) => (id, i.toLong, p) }
      }
      .toDF("doc_id", "para_idx", "para")
      .select($"doc_id", $"para_idx",
        md5(to_binary($"para", lit("utf-8"))).as("ph"))
      // persisted: the structure flatMap + hashing feeds BOTH the count
      // aggregate and the join-back rows (different exchanges — Spark
      // cannot reuse one); released by the caller via CacheRegistry
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(paras)
    // r8: only duplicated paragraph hashes (n ≥ 2) join back — the salted
    // replication then carries the boilerplate keys only, not the whole
    // distinct-paragraph table; a unique paragraph's n is implicitly 1
    // (left-join null, which the n > 1 test below already treats as false)
    val counts = paras.groupBy($"ph").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2)
    val joined = Dedup.saltedLeftJoinDups(
      paras.withColumn("_rid", concat_ws("#", $"doc_id", $"para_idx")),
      counts, "ph", "_rid")
    joined.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when($"n" > 1, 1L).otherwise(0L)).as("n_dup_paras"))
      .select($"doc_id", $"n_paras", $"n_dup_paras",
        ($"n_dup_paras".cast("double") / $"n_paras".cast("double"))
          .as("dup_para_frac"))
      .withColumn("para_dedup_keep", $"dup_para_frac" <= 0.3)
      .orderBy($"doc_id")
  }
}
