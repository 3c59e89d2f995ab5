package graft.text

import java.util.regex.Pattern

/** String similarity scorers (ref kazu/language/string_similarity_scorers.py:14-133).
  * Boolean scorers are exact ports; the fuzzy ratio scorer re-expresses the
  * RapidFuzz variants the reference uses; the embedding scorer is a pluggable
  * trait with a deterministic fallback (the SapBERT ONNX encoder slot).
  */
object Similarity {

  trait Scorer extends Serializable {
    def score(referenceTerm: String, queryTerm: String): Double
  }

  /** All numbers in reference == numbers in query (multiset equality). */
  object NumberMatch extends Scorer {
    private val numbers = Pattern.compile("[0-9]+")
    private def counts(s: String): Map[String, Int] = {
      val m = numbers.matcher(s)
      val out = scala.collection.mutable.HashMap.empty[String, Int]
      while (m.find()) out(m.group()) = out.getOrElse(m.group(), 0) + 1
      out.toMap
    }
    def matches(ref: String, query: String): Boolean = counts(ref) == counts(query)
    def score(ref: String, query: String): Double = if (matches(ref, query)) 1.0 else 0.0
  }

  /** All "TYPE n" phrases in reference are present (≥count) in query. */
  object EntitySubtype extends Scorer {
    // boundary after the alternatives: without it "TYPE II" extracts as
    // the phrase "TYPE I" (and "TYPE 23" vs "TYPE 2" similarly), making
    // distinct subtypes score compatible.
    private val phrases = Pattern.compile("(?<![A-Z])TYPE (?:I+|[0-9]+)(?![IVX0-9])")
    // The reference scorer (string_similarity_scorers.py:39-62) contractually
    // receives NORMALIZED terms — its normalizer has already rewritten
    // II/IV/IX/… to digits, which is why its bare `TYPE (?:I|[0-9]+)` regex
    // is safe there. Un-normalized input reaching this scorer directly
    // would otherwise fall in a hole: "TYPE IV" extracts NOTHING (the
    // lookahead correctly blocks the partial "TYPE I") and scores
    // vacuously compatible with "TYPE V". Make the normalization part of
    // the scorer: canonicalize through the SAME substitution pass the
    // reference normalizer uses (roman→digit incl. standalone I/V), then
    // count — idempotent on already-normalized input, so the in-pipeline
    // behavior is unchanged.
    private def canon(s: String): String =
      graft.text.Normalizer.Default.replaceSubstrings(s)
        .replaceAll("(?U)\\s+", " ").trim
    private def counts(raw: String): Map[String, Int] = {
      val m = phrases.matcher(canon(raw))
      val out = scala.collection.mutable.HashMap.empty[String, Int]
      while (m.find()) out(m.group()) = out.getOrElse(m.group(), 0) + 1
      out.toMap
    }
    def matches(ref: String, query: String): Boolean =
      counts(ref).forall { case (p, c) => counts(query).getOrElse(p, 0) >= c }
    def score(ref: String, query: String): Double = if (matches(ref, query)) 1.0 else 0.0
  }

  /** Each configured modifier phrase must appear in both terms or neither. */
  final class EntityNounModifier(phrases: Seq[String]) extends Scorer {
    def matches(ref: String, query: String): Boolean =
      phrases.forall(p => ref.contains(p) == query.contains(p))
    def score(ref: String, query: String): Double = if (matches(ref, query)) 1.0 else 0.0
  }

  /** Indel (insert/delete-only edit) distance — Levenshtein with
    * substitution cost 2; the distance underlying fuzz.ratio. */
  def indelDistance(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var curr = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      curr(0) = i
      var j = 1
      while (j <= b.length) {
        val sub = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 2
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + sub)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(b.length)
  }

  /** Similarity ratio in [0,100] (as fuzz.ratio: 100·(1 − indel/total)). */
  def ratio(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) return 100.0
    100.0 * (1.0 - indelDistance(a, b).toDouble / total)
  }

  private def words(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty) // python str.split() semantics

  private def sortJoin(s: String): String = words(s).sorted.mkString(" ")

  def tokenSortRatio(a: String, b: String): Double =
    ratio(sortJoin(a), sortJoin(b))

  /** fuzz.partial_ratio: best `ratio` of the shorter string against any
    * length-≤|shorter| window of the longer (including the truncated
    * boundary windows rapidfuzz scans). Exhaustive over all window
    * alignments — rapidfuzz's character-set skip is a pruning of provably
    * suboptimal windows, so the optimum is identical. */
  def partialRatio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 100.0
    val (s1, s2) = if (a.length <= b.length) (a, b) else (b, a)
    if (s1.isEmpty) return 0.0
    def best(shorter: String, longer: String): Double = {
      var res = 0.0
      var k = -(shorter.length - 1)
      while (k <= longer.length - 1) {
        val lo = math.max(0, k)
        val hi = math.min(longer.length, k + shorter.length)
        if (hi > lo) {
          val r = ratio(shorter, longer.substring(lo, hi))
          if (r > res) res = r
        }
        k += 1
      }
      res
    }
    val r = best(s1, s2)
    // rapidfuzz: equal lengths are tried in both roles
    if (r != 100.0 && s1.length == s2.length) math.max(r, best(s2, s1)) else r
  }

  /** fuzz.token_set_ratio (rapidfuzz fuzz_py semantics): compare the sorted
    * unique-token difference strings assuming the intersection matches. */
  def tokenSetRatio(a: String, b: String): Double = {
    val ta = words(a).toSet
    val tb = words(b).toSet
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val sect = ta & tb
    val diffAb = (ta -- tb).toSeq.sorted.mkString(" ")
    val diffBa = (tb -- ta).toSeq.sorted.mkString(" ")
    if (sect.nonEmpty && (diffAb.isEmpty || diffBa.isEmpty)) return 100.0
    val sectLen = sect.toSeq.sorted.mkString(" ").length
    val sectBonus = if (sectLen != 0) 1 else 0
    val sectAbLen = sectLen + sectBonus + diffAb.length
    val sectBaLen = sectLen + sectBonus + diffBa.length
    val totalLen = sectAbLen + sectBaLen
    val dist = indelDistance(diffAb, diffBa)
    val result =
      if (totalLen == 0) 100.0 else 100.0 - 100.0 * dist / totalLen
    if (sectLen == 0) return result
    val sectAbRatio = 100.0 - 100.0 * (sectBonus + diffAb.length) / (sectLen + sectAbLen)
    val sectBaRatio = 100.0 - 100.0 * (sectBonus + diffBa.length) / (sectLen + sectBaLen)
    math.max(result, math.max(sectAbRatio, sectBaRatio))
  }

  /** fuzz.token_ratio = max(token_sort_ratio, token_set_ratio). */
  def tokenRatio(a: String, b: String): Double =
    math.max(tokenSortRatio(a, b), tokenSetRatio(a, b))

  /** fuzz.partial_token_ratio: early-100 on any shared token, else best of
    * partial over sorted-joined tokens and over the difference strings. */
  def partialTokenRatio(a: String, b: String): Double = {
    val ta = words(a).toSet
    val tb = words(b).toSet
    if ((ta & tb).nonEmpty) return 100.0
    val sortedA = sortJoin(a); val sortedB = sortJoin(b)
    val diffA = ta.toSeq.sorted.mkString(" ")
    val diffB = tb.toSeq.sorted.mkString(" ")
    val r = partialRatio(sortedA, sortedB)
    if (diffA.length < sortedA.length || diffB.length < sortedB.length)
      math.max(r, partialRatio(diffA, diffB))
    else r
  }

  /** fuzz.WRatio — the weighted combination rapidfuzz documents: plain
    * ratio, token ratios scaled by 0.95, and (for very different lengths)
    * partial ratios scaled by 0.9 / 0.6. */
  def wRatio(a: String, b: String): Double = {
    val UnbaseScale = 0.95
    if (a.isEmpty || b.isEmpty) return 0.0
    val lenRatio = math.max(a.length, b.length).toDouble / math.min(a.length, b.length)
    var end = ratio(a, b)
    if (lenRatio < 1.5)
      return math.max(end, tokenRatio(a, b) * UnbaseScale)
    val partialScale = if (lenRatio < 8.0) 0.9 else 0.6
    end = math.max(end, partialRatio(a, b) * partialScale)
    math.max(end, partialTokenRatio(a, b) * UnbaseScale * partialScale)
  }

  /** Ref RapidFuzzStringSimilarityScorer (string_similarity_scorers.py:81-92):
    * token_sort_ratio when the reference term is long (>10 chars) AND
    * multi-token (>4 space-split tokens), else WRatio. */
  object Fuzzy extends Scorer {
    def score(ref: String, query: String): Double =
      if (ref.length > 10 && ref.split(" ").length > 4) tokenSortRatio(ref, query)
      else wRatio(ref, query)
  }

  /** The SapBERT slot (ref SapbertStringSimilarityScorer + SapBertHelper):
    * cosine over string embeddings, with the encoder behind a pluggable
    * trait. The default binding is [[graft.ner.MiniBernEmbedder]] — the
    * executor-pinned MiniBern trunk's mean-pooled encodings — so the
    * embedding scorers carry real transformer inference; production swaps
    * in an exported encoder session through the same trait.
    */
  trait Embedder extends Serializable {
    def embed(s: String): Array[Float]
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else s / math.sqrt(na * nb)
  }

  final class EmbeddingScorer(embedder: Embedder) extends Scorer {
    def score(ref: String, query: String): Double =
      if (ref == query) 1.0
      else cosine(embedder.embed(ref), embedder.embed(query))
  }

  // the ner→text reference is deliberate: the encoder lives with the model
  // session (ner), the scorer slot binds it as the default here
  lazy val defaultEmbedding: EmbeddingScorer =
    new EmbeddingScorer(graft.ner.MiniBernEmbedder)
}
