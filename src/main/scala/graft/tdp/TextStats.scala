package graft.tdp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: quality scoring,
  * language ID, token counting, document fingerprinting. All narrow maps —
  * no shuffle; at 100 TB these run at scan speed with column pruning
  * (only `doc_id`, `text` read).
  */
object TextStats {

  /** PII scrubbing — a first-class pretraining-corpus op: redact emails,
    * phone numbers, and IPv4 addresses with typed placeholders and count
    * the redactions per document. Pure codegen'd built-ins (regexp_count /
    * regexp_replace), narrow map, scan-speed at 100 TB. Patterns restrict
    * to the regex subset with identical semantics in java.util.regex and
    * RE2 (no lookaround/backrefs), so the DuckDB oracle replays them
    * verbatim. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def scrubPii(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(
        $"doc_id",
        regexp_count($"text", lit(EmailRe)).cast("long").as("n_emails"),
        // count phones on the EMAIL-scrubbED text: a phone-shaped run inside
        // an email local part is scrubbed as [EMAIL], so counting it as a
        // phone would disagree with the [PHONE] replacements in scrubbed_md5
        regexp_count(regexp_replace($"text", EmailRe, "[EMAIL]"),
          lit(PhoneRe)).cast("long").as("n_phones"),
        // count IPs on the phone-scrubbed text so a phone number is never
        // double-counted as an IP-like digit run
        regexp_count(regexp_replace(regexp_replace($"text", EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"), lit(Ipv4Re)).cast("long").as("n_ips"),
        md5(to_binary(
          regexp_replace(regexp_replace(regexp_replace($"text",
            EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"), Ipv4Re, "[IP]"),
          lit("utf-8"))).as("scrubbed_md5"))
      .orderBy($"doc_id")
  }

  /** Deterministic stratified sampling — reproducible corpus subsampling
    * for training-data curation: keep a document iff an integer hash of
    * (doc_id, salt) falls under its language's rate. Pure integer
    * arithmetic (Knuth multiplicative hash into [0, 10000)), so the sample
    * is identical across runs, engines, partitionings, and cluster sizes —
    * no RNG state, no sampling-order dependence; a narrow codegen'd filter
    * at scan speed. */
  def stratifiedSample(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, lang, ...)
      ratesPerMyriad: Map[String, Int], // lang → keep-rate out of 10000
      salt: Long = 17L
  ): DataFrame = {
    import spark.implicits._
    val rateExpr = ratesPerMyriad.toSeq.sortBy(_._1)
      .foldLeft(lit(0)) { case (acc, (lang, rate)) =>
        when($"lang" === lang, lit(rate)).otherwise(acc)
      }
    docs
      // mask to 31 bits BEFORE the multiply: (2^31-1) * 2654435761 < 2^63,
      // so the product never wraps int64 — Spark wraps silently on overflow
      // while DuckDB raises, so an unmasked multiply breaks cross-engine
      // byte-reproducibility for doc_id ≳ 3.5e9 (and at 10^12 docs it WOULD
      // overflow); the masked hash is identical in both engines at any id
      .withColumn("_bucket",
        pmod(pmod($"doc_id" + lit(salt), lit(2147483648L)) * lit(2654435761L),
          lit(10000L)))
      .filter($"_bucket" < rateExpr)
      .drop("_bucket")
  }

  /** Per-doc quality metrics, expressed in codegen'd built-in functions
    * (no UDF in the hot path): char/token/distinct-token counts, stopword
    * count and ratio, BPE-ish regex token count. */
  def quality(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(
      $"doc_id",
      length($"text").cast("long").as("n_chars"),
      size(split($"text", " ")).cast("long").as("n_tokens"),
      size(array_distinct(split($"text", " "))).cast("long").as("n_distinct_tokens"),
      expr("cast(size(filter(split(text, ' '), x -> x IN ('the', 'a'))) as long)")
        .as("n_stopwords"),
      expr("cast(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as long)")
        .as("n_bpe_tokens")
    ).withColumn("stopword_ratio",
        $"n_stopwords".cast("double") / $"n_tokens".cast("double"))
      .orderBy($"doc_id")
  }

  /** Character/word n-gram profiles per language for the heuristic
    * language-ID scorer. Deterministic, tiny, embedded: scores by overlap of
    * the doc's frequent words with per-language function-word sets. */
  val LangProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "que", "en"),
    "zh" -> Set.empty
  )

  final case class LangPred(doc_id: Long, lang_pred: String, lang_score: Double)

  /** n-gram-heuristic language ID (stopword-profile voting with an ASCII
    * prior). Pure function per row. */
  def predictLang(text: String): (String, Double) = {
    // limit -1 keeps trailing empty tokens, matching the oracle's
    // regexp_split_to_array bit-for-bit on leading/trailing-whitespace and
    // empty text (Java's default drops trailing empties — a latent
    // cross-engine divergence in the denominator); empty tokens match no
    // profile, so they only enter the word count, as in the oracle
    val words = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1).toSeq
    if (words.isEmpty) return ("und", 0.0) // unreachable: split(-1) ≥ 1 token
    val scores = LangProfiles.map { case (lang, profile) =>
      lang -> words.count(profile.contains).toDouble / words.size
    }
    val nonAscii = text.count(_ > 127).toDouble / math.max(text.length, 1)
    val adjusted = scores.map { case (l, s) =>
      l -> (if (l == "zh") nonAscii else s)
    }
    adjusted.toSeq.sortBy { case (l, s) => (-s, l) }.head
  }

  def langId(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) =>
        val (lang, score) = predictLang(t)
        // raw double: score = int/int division, bit-identical cross-engine
        LangPred(id, lang, score)
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Rolling-hash (Rabin–Karp) document fingerprints: winnowed k-gram
    * hashes, the classic copy-detection sketch. */
  def fingerprints(text: String, k: Int = 16, window: Int = 8): Array[Long] = {
    val n = text.length
    if (n < k) return Array(Dedup.simhash(text))
    val B = 1000000007L
    val hashes = new Array[Long](n - k + 1)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); if (i < k - 1) pow *= B; i += 1 }
    hashes(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * pow) * B + text.charAt(i)
      hashes(i - k + 1) = h
      i += 1
    }
    // winnowing: min hash of each window (dedup consecutive picks)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var w = 0
    var last = Long.MinValue
    while (w + window <= hashes.length) {
      var m = hashes(w)
      var j = 1
      while (j < window) { if (hashes(w + j) < m) m = hashes(w + j); j += 1 }
      if (m != last) { out += m; last = m }
      w += window
    }
    if (out.isEmpty) out += hashes(0)
    out.toArray
  }

  def fingerprintDocs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, t) =>
        val fps = fingerprints(t)
        (id, fps.length.toLong, fps.min)
      }
      .toDF("doc_id", "n_fingerprints", "min_fingerprint")
      .orderBy($"doc_id")
  }
}
