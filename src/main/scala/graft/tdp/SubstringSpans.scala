package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Span-level exact-substring deduplication — the full Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better", ExactSubstr)
  * semantics: find every character range that occurs verbatim ≥2 times in
  * the corpus (across documents or within one) and REMOVE those ranges from
  * the text, rather than scoring document pairs ([[DedupSubstring]] is the
  * pair-scoring flavor).
  *
  * The published tool builds one suffix array over the concatenated corpus —
  * inherently single-machine (Lee et al. shard it by hand). The distributed
  * re-derivation here replaces the suffix array with content-defined
  * anchoring, the same trick storage dedup (CDC) uses:
  *
  *  1. anchor positions = {i : RK16(text[i..i+16)) ≡ 0 (mod p)} — purely
  *     content-determined, so two copies of a run select the SAME
  *     content-relative anchors regardless of document offset or
  *     partitioning (a tumbling-window winnow would NOT give this);
  *  2. each anchor keys the following L chars by md5 — 16 opaque bytes
  *     into the shuffle per anchor, never text; expected shuffle volume
  *     is (16+12)/p bytes per char, ~2x the corpus at p=8;
  *  3. a key occurring ≥2 times marks every occurrence's [i, i+L) range as
  *     duplicated (like ExactSubstr, ALL copies are removed, not all-but-
  *     one — the published behavior);
  *  4. per-document ranges merge (overlap or adjacency) into maximal spans
  *     and are cut out of the text.
  *
  * Detection guarantee: a duplicated run of R chars is found iff it
  * contains an anchor with its L-window inside the run; anchors are an
  * i.i.d.-like 1/p thinning of positions, so the miss probability is
  * (1-1/p)^(R-L-15) — <1% for R ≥ L + 16 + 4.6·p, and deterministic given
  * content (no RNG, reproducible across engines/runs). Edge granularity:
  * detected spans start at an anchor, so up to ~p leading chars of a run
  * can survive; the interior is fully covered by overlapping L-windows.
  *
  * Unicode contract (shared with [[TextStats.fingerprints]] and its
  * oracle): positions and hash units are UTF-16 code units on the engine
  * side and code points in the DuckDB replay — identical for BMP text (the
  * corpus contract); a surrogate-pair character would shift anchors by one
  * unit between the two formulations.
  *
  * Scale shape (the [[DedupSubstring]] lessons applied):
  *  - the anchor table is persisted ONCE and feeds both the duplicate-key
  *    count and the semi-join back (caller releases via CacheRegistry);
  *  - duplicate marking is groupBy + LEFT SEMI join — never a self-join,
  *    so a corpus-wide boilerplate key costs its own row count, not a
  *    quadratic pair explosion (the r4 SKEW.md finding);
  *  - interval merging is per-document (state bounded by doc length / p),
  *    and the text rejoin is a plain equi-join on doc_id, one row per doc
  *    on each side — no skew surface.
  */
object SubstringSpans {

  /** Rabin–Karp base shared with [[TextStats.fingerprints]] so the DuckDB
    * oracle reuses the same positional-power formulation. */
  private val B = 1000000007L

  /** Content-defined anchor positions: i such that the RK hash of the
    * k-gram at i is ≡ 0 (mod p) and the L-char key window [i, i+l) fits.
    * p must be a power of two (the oracle takes the low bits of the
    * unsigned hash; `& (p-1)` is that same operation on the wrapped Long).
    */
  private[graft] def anchorPositions(text: String, k: Int, p: Int, l: Int): Array[Int] = {
    require(Integer.bitCount(p) == 1, s"p must be a power of two, got $p")
    require(l >= k, s"key window l=$l must cover the k-gram k=$k")
    val n = text.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n < l) return out.toArray
    val mask = (p - 1).toLong
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); if (i < k - 1) pow *= B; i += 1 }
    if ((h & mask) == 0L) out += 0
    i = k
    val maxStart = n - l // inclusive: last i with i + l <= n
    while (i - k + 1 <= maxStart && i < n) {
      h = (h - text.charAt(i - k) * pow) * B + text.charAt(i)
      if ((h & mask) == 0L) out += i - k + 1
      i += 1
    }
    out.toArray
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One MD5 instance per thread (r8): `MessageDigest.getInstance` walks
    * the JCA provider list per call; `digest()` resets the instance, so
    * thread-local reuse is safe and free. */
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MD5 → lowercase hex. r8: nibble-table lookup replaces the per-byte
    * `f"...%02x"` interpolator — that was a java.lang.String.format call
    * (format-string parse + boxing + Formatter) for EVERY byte of EVERY
    * digest, measured as a top per-row cost in the anchor/window flatMaps
    * (millions of digests per bench pass across this file, C4 and the
    * fingerprint rows). Output is byte-identical. */
  private[graft] def md5Hex(s: String): String = {
    val d = Md5.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      out(2 * i) = HexDigits(b >>> 4)
      out(2 * i + 1) = HexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Raw 16-byte MD5 (r8): the internal anchor/window keys ship as
    * BinaryType — half the shuffle bytes of the 32-char hex string and no
    * hex-encoding work per digest; hex stays only where the digest is an
    * OUTPUT column the oracle replays (clean_md5). */
  private[graft] def md5Bytes(s: String): Array[Byte] =
    Md5.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Raw MD5 of `parts(i) + " " + parts(i+1) + ... + parts(i+n-1)` over
    * PRE-ENCODED UTF-8 parts (r8): the window flatMaps digest every
    * sentence ~3 times via `slice(i, i+3).mkString(" ")` — a per-window
    * array alloc, a StringBuilder copy of the whole window text, and a
    * fresh UTF-8 encode of every sentence per window it appears in. Feeding
    * the digest the cached per-sentence encodings with a single space byte
    * between is byte-identical (UTF-8 is context-free across the space
    * separator, and an unpaired trailing surrogate encodes to the same
    * replacement byte whether or not text follows) and encodes each
    * sentence exactly once per document. */
  private[graft] def md5WindowBytes(
      parts: Array[Array[Byte]], i: Int, n: Int): Array[Byte] = {
    val md = Md5.get()
    var j = i
    while (j < i + n) {
      if (j > i) md.update(' '.toByte)
      md.update(parts(j))
      j += 1
    }
    md.digest()
  }

  /** Merge sorted-by-start [start, start+l) ranges; adjacency merges. */
  private[graft] def mergeSpans(starts: Array[Int], l: Int): Array[(Int, Int)] = {
    java.util.Arrays.sort(starts)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < starts.length) {
      var e = starts(i) + l
      val s = starts(i)
      i += 1
      while (i < starts.length && starts(i) <= e) { e = starts(i) + l; i += 1 }
      out += ((s, e))
    }
    out.toArray
  }

  private[graft] def removeSpans(text: String, spans: Array[(Int, Int)]): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var prev = 0
    spans.foreach { case (s, e) => sb.append(text, prev, s); prev = e }
    sb.append(text, prev, text.length)
    sb.toString
  }

  /** One row per document that contains ≥1 duplicated span:
    * (doc_id, n_spans, dup_chars, clean_len, clean_md5). */
  def duplicateSpans(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text, ...)
      k: Int = 16,
      p: Int = 8,
      l: Int = 64
  ): DataFrame = {
    import spark.implicits._
    val anchors = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        anchorPositions(t, k, p, l).iterator.map { i =>
          (md5Bytes(t.substring(i, i + l)), id, i)
        }
      }
      .toDF("key", "doc_id", "pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.util.CacheRegistry.register(anchors)

    val dupKeys = anchors.groupBy($"key")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= 2)
      .select($"key")
    val dupAnchors = anchors.join(dupKeys, Seq("key"), "left_semi")

    // r8: native hash aggregation instead of groupByKey+mapGroups (typed
    // object shuffle); the interval merge happens in the final per-doc map,
    // which already deserializes the row for removeSpans — mergeSpans
    // sorts its input, so handing it the collected positions directly is
    // the identical computation
    val spans = dupAnchors
      .groupBy($"doc_id")
      .agg(collect_list($"pos").as("starts"))

    spans.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .as[(Long, Seq[Int], String)]
      .map { case (id, starts, t) =>
        val sp = mergeSpans(starts.toArray, l)
        val clean = removeSpans(t, sp)
        (id, sp.length.toLong, sp.map(x => x._2 - x._1).sum.toLong,
          clean.length.toLong, md5Hex(clean))
      }
      .toDF("doc_id", "n_spans", "dup_chars", "clean_len", "clean_md5")
      .orderBy($"doc_id")
  }
}
