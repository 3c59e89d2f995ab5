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
    private val phrases = Pattern.compile("TYPE (?:I|[0-9]+)")
    private def counts(s: String): Map[String, Int] = {
      val m = phrases.matcher(s)
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

  def tokenSortRatio(a: String, b: String): Double =
    ratio(a.split("\\s+").sorted.mkString(" "), b.split("\\s+").sorted.mkString(" "))

  /** Ref RapidFuzzStringSimilarityScorer: token_sort_ratio for long
    * multi-token references, else a best-of blend (WRatio stand-in). */
  object Fuzzy extends Scorer {
    def score(ref: String, query: String): Double =
      if (ref.length > 10 && ref.split(" ").length > 4) tokenSortRatio(ref, query)
      else math.max(ratio(ref, query), tokenSortRatio(ref, query))
  }

  /** The SapBERT slot (ref SapbertStringSimilarityScorer + SapBertHelper):
    * cosine over string embeddings. Production binds an ONNX encoder with an
    * executor-pinned session; this deterministic fallback hashes char
    * trigrams into a dense unit vector so the full pipeline (incl. embedding
    * thresholds) is exercised reproducibly with no model asset.
    */
  trait Embedder extends Serializable {
    def embed(s: String): Array[Float]
  }

  final class HashingEmbedder(dim: Int = 64) extends Embedder {
    def embed(s: String): Array[Float] = {
      val v = new Array[Float](dim)
      val lower = s.toLowerCase(java.util.Locale.ROOT)
      val padded = "^" + lower + "$"
      var i = 0
      while (i + 3 <= padded.length) {
        val h = padded.substring(i, i + 3).hashCode
        v(math.abs(h % dim)) += (if (h >= 0) 1f else -1f)
        i += 1
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (norm > 0) { var j = 0; while (j < dim) { v(j) /= norm; j += 1 } }
      v
    }
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

  val defaultEmbedding: EmbeddingScorer = new EmbeddingScorer(new HashingEmbedder())
}
