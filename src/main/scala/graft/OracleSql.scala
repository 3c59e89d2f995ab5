package graft

/** DuckDB oracle SQL for the hash-sketch operators (dedup_minhash,
  * dedup_simhash, doc_fingerprint): the engine's 64-bit hash kernels
  * ([[graft.tdp.Dedup.hash64]] FNV-1a + xorshift mix, the per-k minhash
  * remix, and the Rabin–Karp rolling hash of
  * [[graft.tdp.TextStats.fingerprints]]) replicated in SQL with HUGEINT
  * mod-2^64 arithmetic, so the oracle recomputes the sketches
  * independently instead of trusting the engine (the same
  * ship-the-constants technique as the ann_lsh plane literals).
  *
  * Arithmetic notes (all validated bit-exact against the JVM kernels):
  *  - values live as HUGEINT in [0, 2^64); `% 2^64` after each multiply
  *    reproduces Java's wrapping `Long` multiply;
  *  - a full 64×64-bit product can overflow INT128, so [[splitmul]] splits
  *    the left operand at 2^32 (lo·b and hi·b both fit);
  *  - `xor` and `>>` are DuckDB-native on HUGEINT (non-negative ⇒ the
  *    shift is logical, matching Java's `>>>`);
  *  - Java compares `Long` SIGNED, so min-reductions convert to BIGINT
  *    two's complement first ([[signed]]).
  */
object OracleSql {

  private val M64 = "18446744073709551616::HUGEINT"

  private def u64(x: Long): String = java.lang.Long.toUnsignedString(x)

  /** (a * b) mod 2^64 for an unsigned-64 SQL expression and a constant. */
  private def splitmul(a: String, b: Long): String =
    s"((($a) % 4294967296) * ${u64(b)}::HUGEINT % $M64 + " +
      s"((($a) // 4294967296) * ${u64(b)}::HUGEINT % 4294967296) * 4294967296) % $M64"

  private def xorshift(h: String, s: Int): String = s"xor(($h), ($h) >> $s)"

  /** u64 HUGEINT → signed BIGINT (two's complement). */
  private def signed(h: String): String =
    s"CAST(CASE WHEN ($h) >= 9223372036854775808::HUGEINT THEN ($h) - $M64 " +
      s"ELSE ($h) END AS BIGINT)"

  // the kernel constants (Dedup.scala): FNV-1a basis/prime and the mix /
  // remix multipliers, shipped as unsigned literals
  private val FnvPrime = 1099511628211L
  private val FnvBasis = 1469598103934665603L
  private val CMix = -49064778989728563L
  private val CRemixK = -7046029254386353131L
  private val CRemixM = -4417276706812531889L

  /** FNV-1a fold over the UTF-16 code units of a string column (the corpus
    * is ASCII, where code unit = code point = `unicode()`); the FNV prime
    * is 41 bits so the in-loop multiply never overflows INT128 and needs no
    * split. */
  private def fnvLoop(col: String, seed: Long): String =
    s"list_reduce(list_prepend(${u64(FnvBasis ^ seed)}::HUGEINT, " +
      s"[unicode(c)::HUGEINT for c in string_split($col, '')]), " +
      s"(h, c) -> xor(h, c) * $FnvPrime::HUGEINT % $M64)"

  /** Java `Arrays.hashCode(long[])` over a 4-element slice of a signed
    * BIGINT list column (32-bit wrapping int arithmetic). */
  private def javaArraysHash(sig: String, band: Int): String = {
    val u = s"(((v)::HUGEINT + $M64) % $M64)"
    val elem = s"CAST(xor($u, $u >> 32) % 4294967296 AS BIGINT)"
    val elemSigned = s"(CASE WHEN $elem >= 2147483648 THEN $elem - 4294967296 ELSE $elem END)"
    val step = s"(((31 * h + $elemSigned) % 4294967296 + 4294967296 + 2147483648) " +
      s"% 4294967296 - 2147483648)"
    s"list_reduce(list_prepend(1::BIGINT, $sig[${4 * band + 1}:${4 * band + 4}]), " +
      s"(h, v) -> $step)"
  }

  /** dedup_simhash: per-word hash64(w, 17), per-bit majority vote, 16-bit
    * block pigeonhole candidates, hamming ≤ 3 verify — all recomputed
    * relationally. */
  val dedupSimhash: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |h1 AS (SELECT doc_id, ${fnvLoop("w", 17L)} AS h FROM toks),
       |h2 AS (SELECT doc_id, ${xorshift("h", 33)} AS h FROM h1),
       |h3 AS (SELECT doc_id, ${splitmul("h", CMix)} AS h FROM h2),
       |h4 AS (SELECT doc_id, ${xorshift("h", 33)} AS h FROM h3),
       |bits AS (
       |  SELECT doc_id, b.range AS bit,
       |         sum(CASE WHEN (h >> CAST(b.range AS INT)) % 2 = 1 THEN 1 ELSE 0 END) AS n_set,
       |         count(*) AS n
       |  FROM h4, range(64) b GROUP BY doc_id, b.range),
       |sim AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN 2 * n_set > n THEN 1::HUGEINT << CAST(bit AS INT)
       |                  ELSE 0::HUGEINT END) AS simhash
       |  FROM bits GROUP BY doc_id),
       |blocks AS (
       |  SELECT doc_id, simhash, blk.range AS blk,
       |         (simhash >> CAST(blk.range * 16 AS INT)) % 65536 AS blk_val
       |  FROM sim, range(4) blk),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS ha, b.simhash AS hb
       |  FROM blocks a JOIN blocks b
       |    ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** dedup_minhash: 3-gram shingles → hash64 base → 64 seeded remixes →
    * min per k → 16×4 banding with Java Arrays.hashCode buckets →
    * signature-similarity ≥ 0.7 verify. The per-k xor constants
    * (k · CRemixK mod 2^64) ship as a VALUES table. */
  val dedupMinhash: String = {
    val kcs = (0 until 64)
      .map(k => s"($k, ${u64(k.toLong * CRemixK)}::HUGEINT)").mkString(", ")
    val bandCases = (0 until 16)
      .map(b => s"WHEN $b THEN ${javaArraysHash("sig", b)}").mkString(" ")
    s"""WITH ks(k, kc) AS (VALUES $kcs),
       |w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, unnest(CASE WHEN len(ws) < 3 THEN [text]
       |    ELSE [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)] END) AS shingle
       |  FROM w),
       |b1 AS (SELECT doc_id, ${fnvLoop("shingle", 0L)} AS h FROM sh),
       |b2 AS (SELECT doc_id, ${xorshift("h", 33)} AS h FROM b1),
       |b3 AS (SELECT doc_id, ${splitmul("h", CMix)} AS h FROM b2),
       |base AS (SELECT doc_id, ${xorshift("h", 33)} AS base FROM b3),
       |r1 AS (SELECT doc_id, k, xor(base, kc) AS h FROM base CROSS JOIN ks),
       |r2 AS (SELECT doc_id, k, ${xorshift("h", 32)} AS h FROM r1),
       |r3 AS (SELECT doc_id, k, ${splitmul("h", CRemixM)} AS h FROM r2),
       |r4 AS (SELECT doc_id, k, ${signed(xorshift("h", 29))} AS h FROM r3),
       |sigk AS (SELECT doc_id, k, min(h) AS mh FROM r4 GROUP BY doc_id, k),
       |sig AS (SELECT doc_id, list(mh ORDER BY k) AS sig FROM sigk GROUP BY doc_id),
       |buckets AS (
       |  SELECT doc_id, b.range AS band,
       |         CASE b.range $bandCases END AS bucket
       |  FROM sig, range(16) b),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |verify AS (
       |  SELECT p.doc_a, p.doc_b,
       |         len([i for i in range(1, 65) if sa.sig[i] = sb.sig[i]]) / 64.0 AS est_jaccard
       |  FROM pairs p JOIN sig sa ON sa.doc_id = p.doc_a
       |               JOIN sig sb ON sb.doc_id = p.doc_b)
       |SELECT doc_a, doc_b, est_jaccard FROM verify
       |WHERE est_jaccard >= 0.7 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** The flagship end-to-end check: the FULL kg_triples dump — subjects,
    * predicates, objects, offsets, match strings, confidences — re-derived
    * relationally from the raw documents table and the ontology semantics,
    * with no exclusion list and no doc filter. 18,741 rows at sf0.01, all
    * bit-exact.
    *
    * The corpus is closed-vocabulary space-separated ASCII text, which
    * makes every pipeline stage's outcome a word-level function; each CTE
    * below encodes one stage's documented semantics:
    *
    *  - `tok`: words with exact char offsets (cumulative-length window).
    *  - `phrase`: two-word gazetteer phrases; the inner single-word matches
    *    they cover lose overlap-merge (longest mapped wins,
    *    merge_overlapping_ents.py:54-70 / post/Post.scala winner rule), so
    *    `resid` emits singles only when NOT consumed by a phrase
    *    (merge ≠ before "join", table ≠ before "scan", scan/join ≠ after
    *    their phrase heads).
    *  - ambiguous non-symbolic synonyms ("scan", "join") carry ONE merged
    *    EquivalentIdSet (MERGED_AS_NON_SYMBOLIC) and emit ALL ids —
    *    two rows per residual occurrence.
    *  - `v`/`vr3`/`winner`: transformer-NER model-vocabulary words
    *    (window/sort = operator; vector/stream/customer = component).
    *    The BIO span finder (SimpleSpanFinder port,
    *    tokenized_word_processor.py; ner/TokenClassifier.findSpans) chains
    *    a span from the first vocab word of a consecutive-vocab-word run
    *    through the last word OF THE SAME CLASS (other-class B labels are
    *    ignored while a span is active; any non-vocab word is O and closes
    *    it). The resulting multi-word span is unmapped (not in the
    *    gazetteer, and fuzzy linking does not ground it), so the merge
    *    winner among the covered words 1..m is the longest mapped single —
    *    char length desc, then class rank (operator > component,
    *    MergeOverlaps.DefaultPreferredOrder), then first position; words
    *    after m are uncovered and emit normally. "customer" is model-only
    *    vocabulary with no gazetteer entry — it never produces a triple.
    *
    * Winners are always trie entities, hence the constant
    * TrieNer/HIGHLY_LIKELY columns (observed and asserted by the hash
    * compare across all rows). */
  val kgTriples: String =
    kgTriplesDump("SELECT doc_id, text FROM documents", "")

  /** The trie-only pipeline variant (withTransformerNer = false): without
    * the transformer there are no multi-word unmapped spans to win
    * overlap-merge over vocabulary RUNS, so EVERY gazetteer vocabulary word
    * (window/sort/vector/stream; never model-only "customer") emits its own
    * mention — `vocab_rows` becomes all of `vr` instead of winner+trail.
    * Phrase/plain/residual semantics are transformer-independent and stay
    * identical. This is the "previous crawl's pipeline" side of the
    * corpus×corpus acceptance comparison. */
  val kgTriplesTrieOnly: String =
    kgTriplesDump("SELECT doc_id, text FROM documents", "", trieOnly = true)

  /** kg_classfilter oracle: the same full-dump derivation over the sliced +
    * suffixed corpus, minus the keys the planted rules drop. The suffix
    * plants one FP trigger token ("bogus" → drops every OP:FILTER mention
    * doc-wide), one TP trigger ("realctx" → keeps SYS:SPARK whose TP rule
    * fires), and SYS:QUERY carries a TP rule that never fires anywhere →
    * dropped corpus-wide (ref rules_based_disambiguation.py:37-288). */
  val kgClassFilter: String =
    kgTriplesDump(
      "SELECT doc_id, text || ' filter bogus realctx spark' AS text " +
        "FROM documents WHERE doc_id % 10 = 0",
      "WHERE obj NOT IN ('OP:FILTER', 'SYS:QUERY')")

  /** Aggregates over the full-dump derivation — NO exclusion lists: the
    * run/merge/nesting semantics encoded in [[kgTriples]] make every
    * (pred, obj) slice derivable, including the ambiguous and
    * model-vocabulary objects that rounds 1–2 had to exclude. */
  val kgTriplesAgg: String =
    s"""SELECT pred, obj, CAST(count(*) AS BIGINT) AS n_mentions
       |FROM ($kgTriples)
       |GROUP BY pred, obj ORDER BY pred, obj""".stripMargin

  val kgGraphStats: String =
    s"""SELECT pred, obj, CAST(count(*) AS BIGINT) AS n_mentions,
       |       CAST(count(DISTINCT url) AS BIGINT) AS n_docs
       |FROM ($kgTriples)
       |GROUP BY pred, obj ORDER BY pred, obj""".stripMargin

  val kgCooccurrence: String =
    s"""WITH present AS (SELECT DISTINCT url, obj FROM ($kgTriples))
       |SELECT a.obj AS obj_a, b.obj AS obj_b,
       |       CAST(count(*) AS BIGINT) AS n_docs
       |FROM present a JOIN present b ON a.url = b.url AND a.obj < b.obj
       |GROUP BY a.obj, b.obj ORDER BY obj_a, obj_b""".stripMargin

  private def kgTriplesDump(docsSource: String, finalWhere: String,
      trieOnly: Boolean = false): String =
    s"""WITH docs AS ($docsSource),
      |tok AS (
      |  SELECT doc_id, idx, w,
      |         CAST(sum(length(w)) OVER (PARTITION BY doc_id ORDER BY idx
      |              ROWS UNBOUNDED PRECEDING) - length(w) + idx - 1 AS INT) AS off,
      |         lag(w)  OVER (PARTITION BY doc_id ORDER BY idx) AS prev,
      |         lead(w) OVER (PARTITION BY doc_id ORDER BY idx) AS next
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |               unnest(range(1, len(string_split(text, ' ')) + 1)) AS idx
      |        FROM docs)),
      |phrase AS (
      |  SELECT doc_id, w || ' ' || next AS match, off,
      |         CAST(off + length(w) + 1 + length(next) AS INT) AS end_,
      |         'mentions_operator' AS pred,
      |         CASE w || ' ' || next
      |           WHEN 'hash join' THEN 'OP:HASH_JOIN'
      |           WHEN 'merge join' THEN 'OP:MERGE_JOIN'
      |           WHEN 'table scan' THEN 'OP:TABLE_SCAN'
      |           WHEN 'index scan' THEN 'OP:INDEX_SCAN' END AS obj
      |  FROM tok
      |  WHERE (w = 'hash' AND next = 'join') OR (w = 'merge' AND next = 'join')
      |     OR (w = 'table' AND next = 'scan') OR (w = 'index' AND next = 'scan')),
      |plain_terms(pw, ppred, pobj) AS (VALUES
      |  ('filter', 'mentions_operator', 'OP:FILTER'),
      |  ('agg',    'mentions_operator', 'OP:AGGREGATE'),
      |  ('group',  'mentions_operator', 'OP:AGGREGATE'),
      |  ('order',  'mentions_operator', 'OP:ORDER_BY'),
      |  ('spark',  'mentions_component', 'SYS:SPARK'),
      |  ('column', 'mentions_component', 'SYS:COLUMN'),
      |  ('row',    'mentions_component', 'SYS:ROW'),
      |  ('batch',  'mentions_component', 'SYS:BATCH'),
      |  ('query',  'mentions_component', 'SYS:QUERY'),
      |  ('key',    'mentions_component', 'SYS:KEY'),
      |  ('value',  'mentions_component', 'SYS:VALUE')),
      |plain AS (
      |  SELECT t.doc_id, t.w AS match, t.off,
      |         CAST(t.off + length(t.w) AS INT) AS end_, s.ppred AS pred, s.pobj AS obj
      |  FROM tok t JOIN plain_terms s ON s.pw = t.w),
      |resid AS (
      |  SELECT doc_id, w AS match, off, CAST(off + length(w) AS INT) AS end_,
      |         'mentions_operator' AS pred, 'OP:MERGE_JOIN' AS obj
      |  FROM tok WHERE w = 'merge' AND (next IS NULL OR next != 'join')
      |  UNION ALL
      |  SELECT doc_id, w, off, CAST(off + length(w) AS INT),
      |         'mentions_component', 'SYS:TABLE'
      |  FROM tok WHERE w = 'table' AND (next IS NULL OR next != 'scan')
      |  UNION ALL
      |  SELECT doc_id, w, off, CAST(off + length(w) AS INT),
      |         'mentions_operator', o.obj
      |  FROM tok CROSS JOIN (VALUES ('OP:INDEX_SCAN'), ('OP:TABLE_SCAN')) o(obj)
      |  WHERE w = 'scan' AND (prev IS NULL OR prev NOT IN ('table', 'index'))
      |  UNION ALL
      |  SELECT doc_id, w, off, CAST(off + length(w) AS INT),
      |         'mentions_operator', o.obj
      |  FROM tok CROSS JOIN (VALUES ('OP:HASH_JOIN'), ('OP:MERGE_JOIN')) o(obj)
      |  WHERE w = 'join' AND (prev IS NULL OR prev NOT IN ('hash', 'merge'))),
      |v AS (
      |  SELECT doc_id, idx, w, off, length(w) AS wlen,
      |         CASE WHEN w IN ('window', 'sort') THEN 'operator'
      |              WHEN w IN ('vector', 'stream', 'customer') THEN 'component'
      |         END AS vcls,
      |         sum(CASE WHEN w IN ('window','sort','vector','stream','customer')
      |                  THEN 0 ELSE 1 END)
      |           OVER (PARTITION BY doc_id ORDER BY idx) AS rid
      |  FROM tok),
      |vr AS (SELECT * FROM v WHERE vcls IS NOT NULL),
      |vr2 AS (
      |  SELECT vr.*,
      |         first_value(vcls) OVER (PARTITION BY doc_id, rid ORDER BY idx
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS x
      |  FROM vr),
      |vr3 AS (
      |  SELECT vr2.*,
      |         max(CASE WHEN vcls = x THEN idx END)
      |           OVER (PARTITION BY doc_id, rid) AS m
      |  FROM vr2),
      |winner AS (
      |  SELECT doc_id, w, off FROM (
      |    SELECT vr3.*,
      |           row_number() OVER (PARTITION BY doc_id, rid
      |             ORDER BY wlen DESC,
      |                      CASE vcls WHEN 'operator' THEN 1 ELSE 0 END DESC,
      |                      idx) AS rn
      |    FROM vr3 WHERE idx <= m AND w != 'customer')
      |  WHERE rn = 1),
      |trail_rows AS (SELECT doc_id, w, off FROM vr3 WHERE idx > m AND w != 'customer'),
      |vocab_rows AS (
      |  SELECT doc_id, w AS match, off, CAST(off + length(w) AS INT) AS end_,
      |         CASE WHEN w IN ('window', 'sort') THEN 'mentions_operator'
      |              ELSE 'mentions_component' END AS pred,
      |         CASE w WHEN 'window' THEN 'OP:WINDOW' WHEN 'sort' THEN 'OP:SORT'
      |                WHEN 'vector' THEN 'SYS:VECTOR' WHEN 'stream' THEN 'SYS:STREAM'
      |         END AS obj
      |  FROM (${
        if (trieOnly) "SELECT doc_id, w, off FROM vr WHERE w != 'customer'"
        else "SELECT * FROM winner UNION ALL SELECT * FROM trail_rows"})),
      |allrows AS (
      |  SELECT * FROM phrase UNION ALL SELECT * FROM plain
      |  UNION ALL SELECT * FROM resid UNION ALL SELECT * FROM vocab_rows)
      |SELECT concat('https://graft.test/doc/', CAST(doc_id AS VARCHAR), '#',
      |              CAST(off AS VARCHAR), '-', CAST(end_ AS VARCHAR)) AS subj,
      |       pred, obj, 'HIGHLY_LIKELY' AS confidence, 'TrieNer' AS namespace,
      |       match, off AS start, end_ AS "end",
      |       concat('https://graft.test/doc/', CAST(doc_id AS VARCHAR)) AS url
      |FROM allrows
      |$finalWhere
      |ORDER BY url, start, end_, pred, obj""".stripMargin

  /** dedup_paragraph: corpus-wide paragraph duplicate fractions re-derived
    * over the same deterministic 8-word-line / 3-line-paragraph structure
    * as the Gopher oracles (ParagraphDedup uses Gopher.structure). */
  def dedupParagraph(docsSource: String, newlineStructure: Boolean = false): String =
    s"""WITH ${gopherStructCtes(docsSource, newlineStructure)},
       |parau AS (SELECT doc_id, unnest(paras) AS p FROM base),
       |ph AS (SELECT doc_id, md5(p) AS h FROM parau),
       |cnt AS (SELECT h, count(*) AS n FROM ph GROUP BY h),
       |perdoc AS (
       |  SELECT doc_id, count(*) AS n_paras,
       |         sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS n_dup
       |  FROM ph JOIN cnt c USING (h) GROUP BY doc_id)
       |SELECT doc_id, CAST(n_paras AS BIGINT) AS n_paras,
       |       CAST(n_dup AS BIGINT) AS n_dup_paras,
       |       CAST(n_dup AS DOUBLE) / CAST(n_paras AS DOUBLE) AS dup_para_frac,
       |       CAST(n_dup AS DOUBLE) / CAST(n_paras AS DOUBLE) <= 0.3
       |         AS para_dedup_keep
       |FROM perdoc ORDER BY doc_id""".stripMargin

  /** bpe_tokens: exact BPE encode counts replayed independently — a
    * recursive CTE applies one merge per step (leftmost occurrence of the
    * lowest-ranked adjacent pair, graft.text.Bpe.encode's spec) with the
    * committed merge table shipped as a literal rank CASE; per-word
    * terminal token counts join back to the documents. Training itself is
    * cross-validated outside SQL: the committed table was generated by the
    * independent python trainer and the Scala trainer must reproduce it
    * (BpeSpec). */
  def bpeTokens(merges: Seq[graft.text.Bpe.Merge]): String = {
    val whens = merges
      .map(m => s"WHEN '${m.left}|${m.right}' THEN ${m.rank}")
      .mkString(" ")
    val rankCase =
      s"CASE toks[i] || '|' || toks[i + 1] $whens ELSE 999999 END"
    s"""WITH RECURSIVE words AS (
       |  SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents),
       |enc(word, toks) AS (
       |  -- string_split('', '') is [''], but the engine encodes the empty
       |  -- word to ZERO tokens — keep parity on irregular spacing
       |  SELECT word, CASE WHEN word = '' THEN []::VARCHAR[]
       |               ELSE [c for c in string_split(word, '')] END
       |  FROM words
       |  UNION ALL
       |  SELECT word,
       |         toks[1 : p - 1] || [toks[p] || toks[p + 1]]
       |           || toks[p + 2 : len(toks)]
       |  FROM (
       |    SELECT word, toks, list_min(pr) AS mr,
       |           list_position(pr, list_min(pr)) AS p
       |    FROM (
       |      SELECT word, toks,
       |             list_transform(range(1, len(toks)), i -> $rankCase) AS pr
       |      FROM enc))
       |  WHERE mr IS NOT NULL AND mr < 999999),
       |term AS (
       |  SELECT word, len(toks) AS n FROM (
       |    SELECT word, toks,
       |           list_transform(range(1, len(toks)), i -> $rankCase) AS pr
       |    FROM enc)
       |  WHERE list_min(pr) IS NULL OR list_min(pr) >= 999999),
       |docw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(t.n) AS BIGINT) AS n_bpe_tokens
       |FROM docw d JOIN term t USING (word)
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** multimodal_neardup: the 8×8 average-hash of every synthetic frame
    * re-derived from the doc_id pixel formulas (geometry w=8+id%24,
    * h=8+(id·31)%24, frames=1+id%3, px=(x+y+id+f)%256; Multimodal.scala) —
    * the engine computes the same hash from DECODED pixels, so one misread
    * sample flips fingerprint bits and fails the compare. Bit 63 lands in
    * the sign bit → two's-complement conversion to BIGINT. */
  val multimodalNearDup: String =
    s"""WITH geo AS (
       |  SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id * 31) % 24 AS h,
       |         1 + doc_id % 3 AS nf
       |  FROM documents),
       |samp AS (
       |  SELECT g.doc_id, f.range AS f, i.range AS i, j.range AS j,
       |         ((i.range * g.w) // 8 + (j.range * g.h) // 8
       |          + g.doc_id + f.range) % 256 AS px
       |  FROM geo g, range(3) f, range(8) i, range(8) j
       |  WHERE f.range < g.nf),
       |tot AS (SELECT doc_id, f, sum(px) AS total FROM samp GROUP BY doc_id, f),
       |fh AS (
       |  SELECT s.doc_id, s.f,
       |         sum(CASE WHEN s.px * 64 > t.total
       |                  THEN 1::HUGEINT << CAST(s.j * 8 + s.i AS INT)
       |                  ELSE 0::HUGEINT END) AS hu
       |  FROM samp s JOIN tot t ON s.doc_id = t.doc_id AND s.f = t.f
       |  GROUP BY s.doc_id, s.f),
       |fhs AS (SELECT doc_id, f, ${signed("hu")} AS hash FROM fh),
       |nfh AS (SELECT doc_id, count(DISTINCT hash) AS n_frame_hashes
       |        FROM fhs GROUP BY doc_id),
       |doch AS (
       |  SELECT a.doc_id, a.hash AS phash, b.n_frame_hashes
       |  FROM fhs a JOIN nfh b USING (doc_id) WHERE a.f = 0),
       |cl AS (SELECT phash, min(doc_id) AS canonical_doc, count(*) AS cluster_size
       |       FROM doch GROUP BY phash)
       |SELECT d.doc_id, d.phash,
       |       CAST(d.n_frame_hashes AS BIGINT) AS n_frame_hashes,
       |       cl.canonical_doc,
       |       CAST(cl.cluster_size AS BIGINT) AS cluster_size,
       |       d.doc_id != cl.canonical_doc AS is_dup
       |FROM doch d JOIN cl USING (phash)
       |ORDER BY d.doc_id""".stripMargin

  /** multimodal_hamming: frame-0 aHashes re-derived from the pixel
    * formulas, distinct-hash block-pigeonhole pairs at hamming ≤ 3 (the
    * dedup_simhash block technique over the image plane). Pair
    * canonicalization on the SIGNED value, matching the engine's Long
    * compare. */
  val multimodalHamming: String = {
    val sa = signed("a.hu")
    val sb = signed("b.hu")
    s"""WITH geo AS (
       |  SELECT doc_id, 8 + doc_id % 24 AS w, 8 + (doc_id * 31) % 24 AS h
       |  FROM documents),
       |samp AS (
       |  SELECT g.doc_id, i.range AS i, j.range AS j,
       |         ((i.range * g.w) // 8 + (j.range * g.h) // 8 + g.doc_id) % 256 AS px
       |  FROM geo g, range(8) i, range(8) j),
       |tot AS (SELECT doc_id, sum(px) AS total FROM samp GROUP BY doc_id),
       |fh AS (
       |  SELECT s.doc_id,
       |         sum(CASE WHEN s.px * 64 > t.total
       |                  THEN 1::HUGEINT << CAST(s.j * 8 + s.i AS INT)
       |                  ELSE 0::HUGEINT END) AS hu
       |  FROM samp s JOIN tot t USING (doc_id) GROUP BY s.doc_id),
       |dh AS (SELECT hu, count(*) AS n FROM fh GROUP BY hu),
       |blocks AS (
       |  SELECT hu, n, b.range AS blk,
       |         (hu >> CAST(b.range * 16 AS INT)) % 65536 AS bv
       |  FROM dh, range(4) b),
       |cand AS (
       |  SELECT DISTINCT a.hu AS ha, a.n AS na, b.hu AS hb, b.n AS nb
       |  FROM blocks a JOIN blocks b
       |    ON a.blk = b.blk AND a.bv = b.bv AND $sa < $sb)
       |SELECT ${signed("ha")} AS hash_a, ${signed("hb")} AS hash_b,
       |       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
       |       CAST(na AS BIGINT) AS n_docs_a, CAST(nb AS BIGINT) AS n_docs_b
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
       |ORDER BY hash_a, hash_b""".stripMargin
  }

  // ---- Gopher repetition / quality rule family --------------------------

  /** Shared structure CTEs for the Gopher oracles: the corpus is
    * single-line, so both engines derive the same deterministic structure —
    * 8-word lines, 3-line paragraphs — from the word list (Gopher.structure).
    * `docsSource` must yield (doc_id, text). Flattened to one line: the
    * enclosing templates apply stripMargin AFTER interpolation, which would
    * otherwise eat leading `||` concatenation operators as margin chars. */
  private def gopherStructCtes(docsSource0: String, newlineStructure: Boolean = false): String = {
    val docsSource = docsSource0.replace('\n', ' ')
    if (newlineStructure)
      // real multi-line corpus path (Gopher.structure's '\n' branch):
      // lines on '\n', paragraphs on '\n\n', words on flattened whitespace
      s"""docs AS ($docsSource),
         |docw AS (SELECT doc_id, text,
         |                string_split(replace(text, chr(10), ' '), ' ') AS w
         |         FROM docs),
         |base AS (
         |  SELECT doc_id, w,
         |         string_split(text, chr(10)) AS lines,
         |         string_split(text, chr(10) || chr(10)) AS paras,
         |         len(w) AS n_words, length(text) AS total_chars
         |  FROM docw)""".stripMargin
    else
      s"""docs AS ($docsSource),
         |docw AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
         |st1 AS (
         |  SELECT doc_id, w,
         |         [array_to_string(w[8*i+1 : 8*i+8], ' ')
         |          for i in generate_series(0, CAST(ceil(len(w) / 8.0) AS INT) - 1)] AS lines
         |  FROM docw),
         |st2 AS (
         |  SELECT doc_id, w, lines,
         |         [array_to_string(lines[3*j+1 : 3*j+3], chr(10))
         |          for j in generate_series(0, CAST(ceil(len(lines) / 3.0) AS INT) - 1)] AS paras
         |  FROM st1),
         |base AS (
         |  SELECT doc_id, w, lines, paras, len(w) AS n_words,
         |         length(array_to_string(paras, chr(10) || chr(10))) AS total_chars
         |  FROM st2)""".stripMargin
  }

  /** All word n-gram occurrences (1-based start position) for one n. */
  private def gramCte(n: Int): String =
    s"""g$n AS (
       |  SELECT doc_id, unnest(generate_series(1, len(w) - ${n - 1})) AS i,
       |         unnest([array_to_string(w[i : i + ${n - 1}], ' ')
       |                 for i in generate_series(1, len(w) - ${n - 1})]) AS g
       |  FROM docw WHERE len(w) >= $n)""".stripMargin

  /** Top-n-gram char mass: count * length, tie-break (count desc, g asc in
    * DuckDB's binary = UTF-8 byte collation, matching Gopher.utf8Less). */
  private def topGramCtes(n: Int): String =
    s"""t$n AS (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY doc_id, g),
       |top$n AS (
       |  SELECT doc_id, c * length(g) AS topchars FROM (
       |    SELECT doc_id, c, g,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
       |    FROM t$n) WHERE rn = 1)""".stripMargin

  /** Duplicate-n-gram char mass: union of word positions covered by
    * occurrences of n-grams appearing ≥ 2 times, summed word lengths. */
  private def dupGramCtes(n: Int): String =
    s"""d$n AS (SELECT doc_id, g FROM g$n GROUP BY doc_id, g HAVING count(*) >= 2),
       |cov$n AS (
       |  SELECT DISTINCT o.doc_id, o.i + k.range AS pos
       |  FROM g$n o JOIN d$n d ON o.doc_id = d.doc_id AND o.g = d.g, range($n) k),
       |ch$n AS (
       |  SELECT cv.doc_id, sum(length(dw.w[cv.pos])) AS dupchars
       |  FROM cov$n cv JOIN docw dw USING (doc_id) GROUP BY cv.doc_id)""".stripMargin

  /** gopher_repetition: all 13 published repetition rules, re-derived
    * relationally (Rae et al. 2021 Table A1; graft.tdp.Gopher). */
  def gopherRepetition(docsSource: String, newlineStructure: Boolean = false): String = {
    val gramNs = 2 to 10
    val ctes = Seq(gopherStructCtes(docsSource, newlineStructure)) ++
      gramNs.map(gramCte) ++
      (2 to 4).map(topGramCtes) ++
      (5 to 10).map(dupGramCtes) ++
      Seq(
        """lineu AS (SELECT doc_id, unnest(lines) AS l FROM base),
          |linec AS (SELECT doc_id, l, count(*) AS c FROM lineu GROUP BY doc_id, l),
          |linestats AS (
          |  SELECT doc_id, sum(c) AS n_lines, sum(c) - count(*) AS dup_lines,
          |         sum((c - 1) * length(l)) AS dup_line_chars
          |  FROM linec GROUP BY doc_id),
          |parau AS (SELECT doc_id, unnest(paras) AS p FROM base),
          |parac AS (SELECT doc_id, p, count(*) AS c FROM parau GROUP BY doc_id, p),
          |parastats AS (
          |  SELECT doc_id, sum(c) AS n_paras, sum(c) - count(*) AS dup_paras,
          |         sum((c - 1) * length(p)) AS dup_para_chars
          |  FROM parac GROUP BY doc_id)""".stripMargin)
    def cfrac(expr: String): String =
      s"CASE WHEN b.total_chars = 0 THEN 0.0 ELSE CAST($expr AS DOUBLE) / b.total_chars END"
    val topCols = (2 to 4).map(n =>
      s"${cfrac(s"coalesce(top$n.topchars, 0)")} AS top_${n}gram_char_frac")
    val dupCols = (5 to 10).map(n =>
      s"${cfrac(s"coalesce(ch$n.dupchars, 0)")} AS dup_${n}gram_char_frac")
    val joins = (2 to 4).map(n => s"LEFT JOIN top$n USING (doc_id)") ++
      (5 to 10).map(n => s"LEFT JOIN ch$n USING (doc_id)")
    val ruleOr = Seq(
      s"dup_line_frac > ${graft.tdp.Gopher.DupLineFracT}",
      s"dup_para_frac > ${graft.tdp.Gopher.DupParaFracT}",
      s"dup_line_char_frac > ${graft.tdp.Gopher.DupLineCharFracT}",
      s"dup_para_char_frac > ${graft.tdp.Gopher.DupParaCharFracT}") ++
      (2 to 4).map(n => s"top_${n}gram_char_frac > ${graft.tdp.Gopher.TopGramT(n)}") ++
      (5 to 10).map(n => s"dup_${n}gram_char_frac > ${graft.tdp.Gopher.DupGramT(n)}")
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT *, (${ruleOr.mkString(" OR ")}) AS repetitive FROM (
       |  SELECT b.doc_id,
       |    CAST(b.n_words AS BIGINT) AS n_words,
       |    CAST(b.total_chars AS BIGINT) AS total_chars,
       |    CAST(ls.dup_lines AS DOUBLE) / ls.n_lines AS dup_line_frac,
       |    ${cfrac("ls.dup_line_chars")} AS dup_line_char_frac,
       |    CAST(ps.dup_paras AS DOUBLE) / ps.n_paras AS dup_para_frac,
       |    ${cfrac("ps.dup_para_chars")} AS dup_para_char_frac,
       |    ${(topCols ++ dupCols).mkString(",\n    ")}
       |  FROM base b
       |  JOIN linestats ls USING (doc_id)
       |  JOIN parastats ps USING (doc_id)
       |  ${joins.mkString("\n  ")})
       |ORDER BY doc_id""".stripMargin
  }

  /** gopher_quality: the 7 Gopher quality rules, re-derived relationally. */
  def gopherQuality(docsSource: String): String = {
    val stop = graft.tdp.Gopher.StopWords.map(s => s"'$s'").mkString(", ")
    s"""WITH ${gopherStructCtes(docsSource)},
       |lineu AS (SELECT doc_id, unnest(lines) AS l FROM base),
       |linest AS (
       |  SELECT doc_id, count(*) AS n_lines,
       |    sum(CASE WHEN starts_with(ltrim(l), '-')
       |              OR starts_with(ltrim(l), '•') THEN 1 ELSE 0 END) AS n_bullet,
       |    sum(CASE WHEN ends_with(rtrim(l), '...')
       |              OR ends_with(rtrim(l), '…') THEN 1 ELSE 0 END) AS n_ellipsis
       |  FROM lineu GROUP BY doc_id),
       |wordstats AS (
       |  SELECT doc_id, len(w) AS n_words,
       |    list_sum(list_transform(w, x -> length(x))) AS sum_word_len,
       |    len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
       |    len(list_filter([$stop], s -> list_contains(w, s))) AS n_stop
       |  FROM base),
       |sym AS (
       |  SELECT doc_id,
       |    (length(text) - length(replace(text, '#', '')))
       |    + (len(string_split(text, '...')) - 1)
       |    + (length(text) - length(replace(text, '…', ''))) AS n_symbols
       |  FROM docs)
       |SELECT *,
       |  (n_words >= 50 AND n_words <= 100000
       |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |   AND symbol_word_ratio <= 0.1
       |   AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
       |   AND alpha_word_frac >= 0.8 AND n_stop_words >= 2) AS quality_keep
       |FROM (
       |  SELECT ws.doc_id,
       |    CAST(ws.n_words AS BIGINT) AS n_words,
       |    CAST(ws.sum_word_len AS DOUBLE) / ws.n_words AS mean_word_len,
       |    CAST(s.n_symbols AS DOUBLE) / ws.n_words AS symbol_word_ratio,
       |    CAST(l.n_bullet AS DOUBLE) / l.n_lines AS bullet_line_frac,
       |    CAST(l.n_ellipsis AS DOUBLE) / l.n_lines AS ellipsis_line_frac,
       |    CAST(ws.n_alpha AS DOUBLE) / ws.n_words AS alpha_word_frac,
       |    CAST(ws.n_stop AS BIGINT) AS n_stop_words
       |  FROM wordstats ws JOIN linest l USING (doc_id) JOIN sym s USING (doc_id))
       |ORDER BY doc_id""".stripMargin
  }

  /** doc_fingerprint: Rabin–Karp 16-gram rolling hashes mod 2^64 (expressed
    * positionally with precomputed base powers — identical to the rolling
    * update by mod distributivity), signed winnowing window-minima with
    * consecutive dedup. Every corpus doc has length ≥ 23, so the short-text
    * fallbacks of the kernel are unreachable here (spec-covered instead);
    * a shorter doc would yield a count mismatch, loudly. */
  private def fingerprintCtes: String = {
    val B = 1000000007L
    val pow = Iterator.iterate(1L)(_ * B).take(16).toIndexedSeq // wraps like the kernel
    val terms = (1 to 16)
      .map(j => s"cs[i+${j - 1}]::HUGEINT * ${u64(pow(16 - j))}::HUGEINT")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT doc_id, [unicode(x) for x in string_split(text, '')] AS cs,
       |         length(text) AS n
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id,
       |         list_transform(range(1, n - 14), i -> ${signed(s"(($terms) % $M64)")}) AS hs
       |  FROM c),
       |wm AS (
       |  SELECT doc_id,
       |         [list_min(hs[8*t+1 : 8*t+8]) for t in range(len(hs) // 8)] AS wm
       |  FROM hs),
       |fp AS (
       |  SELECT doc_id,
       |         list_filter(wm, (x, i) -> i = 1 OR x != wm[i-1]) AS fps
       |  FROM wm)""".stripMargin
  }

  val docFingerprint: String =
    s"""$fingerprintCtes
       |SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fingerprints,
       |       list_min(fps) AS min_fingerprint
       |FROM fp ORDER BY doc_id""".stripMargin

  /** lm_surprisal: the integer-exact unigram surprisal filter replayed
    * relationally — ilog2 as binary-string length − 1 (exact, no float
    * log), integer floor division for the scaled mean. */
  def lmSurprisal(keepMeanBitsX100: Long): String =
    s"""WITH w AS (SELECT doc_id,
       |  unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
       |  FROM documents),
       |c AS (SELECT word, count(*) AS c FROM w GROUP BY word),
       |t AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM c),
       |s AS (SELECT w.doc_id, count(*) AS n,
       |        sum((length(bin(t.total)) - 1) - (length(bin(c.c)) - 1)) AS bits
       |      FROM w JOIN c USING (word), t GROUP BY w.doc_id)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       |       CAST(bits AS BIGINT) AS total_bits,
       |       CAST(bits * 100 // n AS BIGINT) AS mean_bits_x100,
       |       (bits * 100 // n) <= $keepMeanBitsX100 AS lm_keep
       |FROM s ORDER BY doc_id""".stripMargin

  /** corpus_mix: the mT5/PaLM temperature-sampling quota plan replayed in
    * exact integer arithmetic — isqrt via a double seed corrected by a ±2
    * candidate window (HUGEINT squares), integer-division quotas, the same
    * masked multiplicative ppm hash as the engine. */
  def corpusMix(budget: Long, salt: Long): String =
    s"""WITH dc AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |q AS (SELECT lang, n,
       |        list_max(list_filter(
       |          [s0 - 2, s0 - 1, s0, s0 + 1, s0 + 2],
       |          s -> s >= 0 AND s * s <= n::HUGEINT * 1000000000000::HUGEINT))
       |          AS q
       |      FROM (SELECT lang, n,
       |              CAST(floor(sqrt(CAST(n AS DOUBLE) * 1e12)) AS HUGEINT) AS s0
       |            FROM dc)),
       |d AS (SELECT sum(q) AS denom FROM q),
       |plan AS (SELECT lang, n, q,
       |           CAST(q * 1000000 // denom AS BIGINT) AS weight_ppm,
       |           CAST($budget * q // denom AS BIGINT) AS target
       |         FROM q, d),
       |plan2 AS (SELECT lang, n, weight_ppm, target,
       |            CAST(least(1000000::HUGEINT,
       |                       target::HUGEINT * 1000000 // n) AS BIGINT)
       |              AS threshold_ppm
       |          FROM plan),
       |s AS (SELECT dd.lang, count(*) AS n_sampled
       |      FROM documents dd JOIN plan2 p USING (lang)
       |      -- pmod, not %: DuckDB % takes the dividend's sign, so a
       |      -- negative doc_id would go negative and compare always-true;
       |      -- the engine's pmod is non-negative for any id
       |      WHERE (((dd.doc_id + $salt) % 2147483648 + 2147483648)
       |             % 2147483648) * 2654435761 % 1000000
       |            < p.threshold_ppm
       |      GROUP BY dd.lang)
       |SELECT p.lang, CAST(p.n AS BIGINT) AS n_docs, p.weight_ppm, p.target,
       |       p.threshold_ppm,
       |       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
       |FROM plan2 p LEFT JOIN s USING (lang)
       |ORDER BY p.lang""".stripMargin

  /** pack_sequences: the GPT-style concat-and-cut layout replayed with the
    * window cumsum the ENGINE deliberately avoids (a single-task window is
    * fine for the oracle; the engine uses the two-phase distributed scan —
    * same semantics, different execution shape). */
  def packSequences(capacity: Long): String =
    s"""WITH t AS (SELECT doc_id,
       |  len(list_filter(string_split(text, ' '), x -> x != '')) + 1 AS n
       |  FROM documents),
       |o AS (SELECT doc_id, n,
       |        coalesce(sum(n) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |      FROM t),
       |m AS (SELECT doc_id, unnest(generate_series(
       |        CAST(off // $capacity AS BIGINT),
       |        CAST((off + n - 1) // $capacity AS BIGINT))) AS chunk_id FROM o),
       |tot AS (SELECT sum(n) AS total FROM t)
       |SELECT CAST(m.chunk_id AS BIGINT) AS chunk_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
       |  CAST(least((m.chunk_id + 1) * $capacity, tot.total)
       |       - m.chunk_id * $capacity AS BIGINT) AS n_tokens
       |FROM m, tot GROUP BY m.chunk_id, tot.total
       |ORDER BY chunk_id""".stripMargin

  /** c4_quality: the C4 line + page rules (Raffel et al. 2020 §2.2)
    * replayed relationally over the reconstructed sentence-structured
    * corpus. Retained text = lines ending in terminal punctuation, with
    * ≥5 words, without the word "javascript"; page keep additionally needs
    * ≥3 sentences in the retained text and no lorem-ipsum / curly-brace /
    * blocklist-word occurrence on the original page. */
  def c4Quality(docsSource0: String, blocklist: Seq[String]): String = {
    val docsSource = docsSource0.replace('\n', ' ')
    // quote-escape each word and keep the predicate well-formed for an
    // empty blocklist (an empty OR chain would be a parse error)
    val blockedPred =
      if (blocklist.isEmpty) "false"
      else blocklist.map(_.toLowerCase(java.util.Locale.ROOT))
        .map(b => s"list_contains(pw, '${b.replace("'", "''")}')")
        .mkString(" OR ")
    s"""WITH docs AS ($docsSource),
       |li AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM docs),
       |lu AS (SELECT doc_id, unnest(generate_series(1, len(lines))) AS k,
       |              unnest(lines) AS line FROM li),
       |keptl AS (
       |  SELECT doc_id, k, line FROM (
       |    SELECT doc_id, k, line,
       |           list_filter(string_split(line, ' '), x -> x != '') AS wds
       |    FROM lu)
       |  WHERE length(line) > 0
       |    AND substr(line, length(line), 1) IN ('.', '!', '?', '"')
       |    AND len(wds) >= 5
       |    AND NOT list_contains(list_transform(wds, x -> lower(x)), 'javascript')),
       |ks AS (SELECT doc_id, count(*) AS n_kept,
       |         sum(length(line)
       |             - length(replace(replace(replace(line,'.',''),'!',''),'?',''))
       |            ) AS n_sent,
       |         string_agg(line, chr(10) ORDER BY k) AS clean
       |       FROM keptl GROUP BY doc_id),
       |pf AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_lines,
       |              ($blockedPred) AS has_blocked,
       |              contains(lower(text), 'lorem ipsum') AS has_lorem,
       |              contains(text, '{') AS has_brace
       |       FROM (SELECT doc_id, text,
       |               list_filter(string_split(lower(replace(text, chr(10), ' ')), ' '),
       |                           x -> x != '') AS pw
       |             FROM docs))
       |SELECT p.doc_id, CAST(p.n_lines AS BIGINT) AS n_lines,
       |       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept_lines,
       |       CAST(coalesce(k.n_sent, 0) AS BIGINT) AS n_sentences,
       |       p.has_blocked, p.has_lorem, p.has_brace,
       |       (coalesce(k.n_sent, 0) >= 3 AND NOT p.has_blocked
       |        AND NOT p.has_lorem AND NOT p.has_brace) AS c4_keep,
       |       md5(coalesce(k.clean, '')) AS clean_md5
       |FROM pf p LEFT JOIN ks k USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin
  }

  /** c4_three_sentence_dedup: C4's corpus-level rule — of any 3-sentence
    * span occurring more than once, keep only the canonical (minimal
    * (doc_id, pos)) occurrence; other occurrences' sentences are removed.
    * Sentence split = replace "([.!?]) " with mark+U+0001, split (the same
    * lookbehind-free formulation the engine uses). */
  def c4ThreeSentenceDedup(docsSource0: String): String = {
    val docsSource = docsSource0.replace('\n', ' ')
    s"""WITH docs AS ($docsSource),
       |sent AS (SELECT doc_id,
       |           string_split(regexp_replace(replace(text, chr(10), ' '),
       |             '([.!?]) ', '\\1' || chr(1), 'g'), chr(1)) AS s
       |         FROM docs),
       |occ AS (SELECT doc_id,
       |          unnest(generate_series(1, len(s) - 2)) AS i,
       |          unnest([array_to_string(s[i : i + 2], ' ')
       |                  for i in generate_series(1, len(s) - 2)]) AS w
       |        FROM sent WHERE len(s) >= 3),
       |rk AS (SELECT doc_id, i, w,
       |         count(*) OVER (PARTITION BY w) AS n,
       |         row_number() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn
       |       FROM occ),
       |rem AS (SELECT DISTINCT doc_id, i + k.range AS p
       |        FROM rk, range(3) k WHERE n >= 2 AND rn > 1),
       |perdoc AS (SELECT doc_id, count(*) AS n_windows,
       |             sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS n_dup
       |           FROM rk GROUP BY doc_id),
       |remc AS (SELECT doc_id, count(*) AS n_removed FROM rem GROUP BY doc_id),
       |su AS (SELECT doc_id, unnest(generate_series(1, len(s))) AS j,
       |              unnest(s) AS sentence FROM sent),
       |cleans AS (
       |  SELECT su.doc_id, string_agg(su.sentence, ' ' ORDER BY su.j) AS c
       |  FROM su LEFT JOIN rem ON su.doc_id = rem.doc_id AND su.j = rem.p
       |  WHERE rem.p IS NULL GROUP BY su.doc_id)
       |SELECT d.doc_id,
       |       CAST(len(sent.s) AS BIGINT) AS n_sentences,
       |       CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
       |       CAST(coalesce(pd.n_dup, 0) AS BIGINT) AS n_dup_windows,
       |       CAST(coalesce(rc.n_removed, 0) AS BIGINT) AS n_removed_sentences,
       |       md5(coalesce(cl.c, '')) AS clean_md5
       |FROM docs d
       |JOIN sent USING (doc_id)
       |LEFT JOIN perdoc pd USING (doc_id)
       |LEFT JOIN remc rc USING (doc_id)
       |LEFT JOIN cleans cl USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** dedup_substring_spans: the span-level ExactSubstr semantics replayed
    * relationally. Content-defined anchors re-derived from the SAME
    * positional Rabin–Karp formulation as doc_fingerprint (low bits of the
    * unsigned 64-bit hash ≡ 0 mod p), each anchor keying md5(substr(., L));
    * keys occurring ≥2 times mark [i, i+L); per-doc gaps-and-islands merge
    * (adjacency merges, running-max end); cleaned text = string_agg of the
    * inter-span segments + tail, md5'd. */
  def substringSpans(p: Int, l: Int): String = {
    val B = 1000000007L
    val pow = Iterator.iterate(1L)(_ * B).take(16).toIndexedSeq
    val terms = (1 to 16)
      .map(j => s"cs[i+${j - 1}]::HUGEINT * ${u64(pow(16 - j))}::HUGEINT")
      .mkString(" + ")
    s"""WITH c AS (
       |  SELECT doc_id, text, [unicode(x) for x in string_split(text, '')] AS cs,
       |         length(text) AS n
       |  FROM documents),
       |anch AS (
       |  SELECT doc_id, unnest(list_filter(range(1, n - $l + 2),
       |           i -> (($terms) % $M64) % $p = 0)) AS i
       |  FROM c),
       |keyed AS (
       |  SELECT a.doc_id, a.i, md5(substr(c.text, a.i, $l)) AS key
       |  FROM anch a JOIN c USING (doc_id)),
       |dup AS (SELECT key FROM keyed GROUP BY key HAVING count(*) >= 2),
       |da AS (SELECT k.doc_id, k.i FROM keyed k JOIN dup USING (key)),
       |brks AS (
       |  SELECT doc_id, i AS s, i + $l AS e,
       |         CASE WHEN i > coalesce(max(i + $l) OVER (
       |             PARTITION BY doc_id ORDER BY i
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |           THEN 1 ELSE 0 END AS brk
       |  FROM da),
       |isl AS (SELECT doc_id, s, e,
       |          sum(brk) OVER (PARTITION BY doc_id ORDER BY s
       |            ROWS UNBOUNDED PRECEDING) AS g
       |        FROM brks),
       |merged AS (SELECT doc_id, min(s) AS s, max(e) AS e
       |           FROM isl GROUP BY doc_id, g),
       |segs AS (SELECT doc_id, s, e,
       |           lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
       |         FROM merged),
       |hd AS (SELECT sg.doc_id,
       |         string_agg(substr(c.text, sg.prev_e, sg.s - sg.prev_e), ''
       |           ORDER BY sg.s) AS head
       |       FROM segs sg JOIN c USING (doc_id) GROUP BY sg.doc_id),
       |tlm AS (SELECT doc_id, max(e) AS laste FROM merged GROUP BY doc_id),
       |tl AS (SELECT t0.doc_id, substr(c.text, t0.laste, c.n - t0.laste + 1) AS tl
       |       FROM tlm t0 JOIN c USING (doc_id)),
       |agg AS (SELECT doc_id, count(*) AS n_spans, sum(e - s) AS dup_chars
       |        FROM merged GROUP BY doc_id)
       |SELECT a.doc_id, CAST(a.n_spans AS BIGINT) AS n_spans,
       |       CAST(a.dup_chars AS BIGINT) AS dup_chars,
       |       CAST(c.n - a.dup_chars AS BIGINT) AS clean_len,
       |       md5(h.head || t.tl) AS clean_md5
       |FROM agg a JOIN c USING (doc_id) JOIN hd h USING (doc_id)
       |     JOIN tl t USING (doc_id)
       |ORDER BY a.doc_id""".stripMargin
  }

  /** dedup_substring: the winnowed-fingerprint postings re-derived from the
    * SAME rolling-hash CTEs as doc_fingerprint, then the capped
    * shared-anchor pair count replayed relationally (blacklist = postings
    * over `maxPosting`, exactly the engine's broadcast anti-join). */
  def dedupSubstring(minShared: Int, maxPosting: Long): String =
    s"""$fingerprintCtes,
       |post AS (SELECT DISTINCT doc_id, unnest(fps) AS f FROM fp),
       |cnt AS (SELECT f, count(*) AS n FROM post GROUP BY f),
       |clean AS (SELECT p.doc_id, p.f FROM post p JOIN cnt c USING (f)
       |          WHERE c.n <= $maxPosting),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM clean a JOIN clean b ON a.f = b.f AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared
       |FROM pairs WHERE n_shared >= $minShared
       |ORDER BY doc_a, doc_b""".stripMargin
}
