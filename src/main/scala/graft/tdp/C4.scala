package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) — the
  * published rule set behind the C4 corpus, the other canonical web-text
  * pipeline next to Gopher ([[Gopher]]) and CCNet ([[ParagraphDedup]]):
  *
  * line level (applied first, producing the retained text):
  *  - keep only lines ending in a terminal punctuation mark (. ! ? ");
  *  - keep only lines with ≥ 5 words;
  *  - drop lines containing the word "javascript" (case-insensitive);
  * page level (flags on the original page):
  *  - discard pages with < 3 sentences in the retained text;
  *  - discard pages containing "lorem ipsum" (case-insensitive);
  *  - discard pages containing a curly brace;
  *  - discard pages with any blocklist word (C4 uses the "List of Dirty,
  *    Naughty …" list; the list is a parameter here);
  * corpus level:
  *  - of any THREE-SENTENCE SPAN occurring more than once in the corpus,
  *    discard all but one occurrence ([[threeSentenceDedup]]) — note the
  *    contrast with ExactSubstr ([[SubstringSpans]]), which removes ALL
  *    occurrences: C4 keeps a canonical copy.
  *
  * Sentences are delimited by a terminal mark followed by a space (the
  * same rule both engines replay: replace "([.!?]) " with mark+U+0001 and
  * split — RE2 in the oracle has no lookbehind, so the Scala side uses the
  * identical replace-then-split formulation rather than a lookbehind).
  *
  * Scale shape: [[quality]] is a pure per-document map (narrow, scan
  * bound). [[threeSentenceDedup]] shuffles windows as 16-byte md5 keys with
  * map-side partial aggregation; the canonical-occurrence join-back goes
  * through the shared 16-way salted join ([[Dedup.saltedJoinBack]]) because
  * a site-wide boilerplate span is one corpus-hot key (the same shape —
  * and the same measured hot key — as the CCNet paragraph dedup).
  */
object C4 {

  val DefaultBlocklist: Seq[String] = Seq("casino", "jackpot")

  private val Terminal = Set('.', '!', '?', '"')

  private[graft] def lineWords(line: String): Array[String] =
    line.split(" ").filter(_.nonEmpty)

  private[graft] def lineKept(line: String): Boolean = {
    if (line.isEmpty || !Terminal.contains(line.last)) return false
    val w = lineWords(line)
    w.length >= 5 && !w.exists(_.equalsIgnoreCase("javascript"))
  }

  /** Sentence split shared with the oracle: a terminal mark followed by a
    * single space ends a sentence (the delimiting space is consumed). */
  private[graft] def sentences(text: String): Array[String] =
    text.replace('\n', ' ')
      .replaceAll("([.!?]) ", "$1\u0001")
      .split("\u0001", -1)

  /** Line + page rules; one row per document. `clean_md5` pins the retained
    * text (kept lines joined by newline).
    *
    * Two documented token-semantics notes (ADVICE r7, oracle-pinned so the
    * behaviour is frozen here rather than "fixed"):
    *  - blocklist matching is EXACT equality on space-split tokens — a
    *    blocked word adjacent to punctuation ("casino!") escapes, unlike
    *    C4's published word-anywhere matching; OracleSql.c4Quality mirrors
    *    the same token-exact rule.
    *  - `n_sentences` counts terminal-mark CHARACTERS in kept lines (a '.'
    *    inside "3.5" counts), which is C4's cheap page heuristic; the
    *    [[sentences]] splitter used by [[threeSentenceDedup]] is a
    *    different, stricter definition and the two deliberately disagree. */
  def quality(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text)
      blocklist: Seq[String] = DefaultBlocklist
  ): DataFrame = {
    import spark.implicits._
    // Locale.ROOT everywhere: a tr_TR default locale would fold 'I' to the
    // dotless ı, diverging from DuckDB's lower() and breaking hash-parity
    val blocked = blocklist.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val lines = t.split("\n", -1)
        val kept = lines.filter(lineKept)
        val nSent = kept.map(_.count(c => c == '.' || c == '!' || c == '?')).sum
        val lower = t.toLowerCase(java.util.Locale.ROOT)
        val hasBlocked = lower.replace('\n', ' ').split(" ").exists(blocked)
        val hasLorem = lower.contains("lorem ipsum")
        val hasBrace = t.contains("{")
        val keep = nSent >= 3 && !hasBlocked && !hasLorem && !hasBrace
        (id, lines.length.toLong, kept.length.toLong, nSent.toLong,
          hasBlocked, hasLorem, hasBrace, keep,
          SubstringSpans.md5Hex(kept.mkString("\n")))
      }
      .toDF("doc_id", "n_lines", "n_kept_lines", "n_sentences",
        "has_blocked", "has_lorem", "has_brace", "c4_keep", "clean_md5")
      .orderBy($"doc_id")
  }

  /** Corpus-wide three-sentence-span dedup: every window of 3 consecutive
    * sentences that occurs ≥ 2 times in the corpus keeps ONE canonical
    * occurrence — the minimal (doc_id, position) — and every other
    * occurrence's sentences are removed. One row per document. */
  def threeSentenceDedup(
      spark: SparkSession,
      docs: DataFrame // (doc_id, text)
  ): DataFrame = {
    import spark.implicits._
    val occ = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val s = sentences(t)
        // binary digest key (r8): 16 bytes into the shuffle, not 32 chars.
        // Each sentence is UTF-8-encoded ONCE and windows digest the cached
        // encodings (byte-identical to md5(slice.mkString(" ")) — see
        // SubstringSpans.md5WindowBytes), instead of re-encoding every
        // sentence for each of the ~3 windows it appears in.
        val enc = s.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (0 to s.length - 3).iterator.map { i =>
          (SubstringSpans.md5WindowBytes(enc, i, 3), id, i)
        }
      }
      .toDF("key", "doc_id", "pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(occ)

    // per-window-value stats: occurrence count + the canonical (minimal)
    // occurrence — a single aggregate over the persisted window table.
    // r8: only windows occurring ≥ 2 times join back (a unique window's
    // n is 1 and it is never removed), so the ×16-salt replication
    // carries the duplicated spans only — on a real corpus the small
    // minority — instead of the whole distinct-window table
    val perKey = occ.groupBy($"key").agg(
      count(lit(1)).as("n"),
      min(struct($"doc_id", $"pos")).as("canon"))
      .filter($"n" >= 2)
    // join back through the shared salted join: a corpus-hot boilerplate
    // span (the planted banner is on every 6th doc) is ONE key
    val marked = Dedup.saltedLeftJoinDups(occ, perKey, "key", "doc_id")
      .select($"doc_id", $"pos", coalesce($"n", lit(1L)).as("n"),
        coalesce($"n" >= 2 &&
            !($"canon.doc_id" === $"doc_id" && $"canon.pos" === $"pos"),
          lit(false)).as("removed"))

    // groupByKey+mapGroups kept deliberately (r8): the collect_list
    // alternative was tried and measured SLOWER — with one group per doc,
    // ObjectHashAggregate exceeds its 128-key in-memory threshold and
    // falls back to sort-based aggregation over every (doc, window) row
    val perDoc = marked.as[(Long, Int, Long, Boolean)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        var nWin = 0L
        var nDup = 0L
        val rem = scala.collection.mutable.SortedSet.empty[Int]
        it.foreach { case (_, pos, n, removed) =>
          nWin += 1
          if (n >= 2) nDup += 1
          if (removed) { rem += pos; rem += pos + 1; rem += pos + 2 }
        }
        (id, nWin, nDup, rem.toArray)
      }
      .toDF("doc_id", "n_windows", "n_dup_windows", "removed_pos")

    docs.select(col("doc_id"), col("text"))
      .join(perDoc, Seq("doc_id"), "left")
      .as[(Long, String, Option[Long], Option[Long], Option[Seq[Int]])]
      .map { case (id, t, nWin, nDup, removedPos) =>
        val s = sentences(t)
        val removed = removedPos.getOrElse(Seq.empty).toSet
        val clean = s.indices.filterNot(removed).map(s).mkString(" ")
        (id, s.length.toLong, nWin.getOrElse(0L), nDup.getOrElse(0L),
          removed.size.toLong, SubstringSpans.md5Hex(clean))
      }
      .toDF("doc_id", "n_sentences", "n_windows", "n_dup_windows",
        "n_removed_sentences", "clean_md5")
      .orderBy($"doc_id")
  }
}
