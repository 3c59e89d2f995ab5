package graft.index

import scala.collection.mutable

/** Minimal deterministic TF-IDF vectorizer + CSR store, re-expressing the
  * role sklearn's TfidfVectorizer plays in the reference (char-bigram index
  * for fuzzy candidate search, kazu/utils/link_index.py:123-139; word 1-2 +
  * char 2-3 gram context scorer,
  * kazu/steps/linking/post_processing/disambiguation/context_scoring.py:23-90).
  *
  * Formulae match sklearn defaults: tf = raw count, idf = ln((1+n)/(1+df))+1
  * (smooth), l2-normalized vectors. Fitted once per parser on the driver
  * during the resource build, then broadcast; per-row scoring is a sparse dot
  * product — the "similarity theta-join" of SURVEY.md §2.G executed map-side.
  */
final case class SparseVec(indices: Array[Int], values: Array[Double])
    extends Serializable {
  def dot(other: SparseVec): Double = {
    var i = 0; var j = 0; var s = 0.0
    while (i < indices.length && j < other.indices.length) {
      val a = indices(i); val b = other.indices(j)
      if (a == b) { s += values(i) * other.values(j); i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    s
  }
}

object Featurizer {
  /** char n-grams as in ref kazu/utils/utils.py:151-180. */
  def charNgrams(s: String, n: Int): Seq[String] =
    if (s.length < n) Seq.empty
    else (0 to s.length - n).map(i => s.substring(i, i + n))

  def wordNgrams(s: String, n: Int): Seq[String] = {
    val words = s.split(" ")
    if (words.length < n) Seq.empty
    else (0 to words.length - n).map(i => words.slice(i, i + n).mkString(" "))
  }

  /** Feature extraction configs. */
  def charBigrams(s: String): Seq[String] = charNgrams(s, 2)

  /** sklearn TfidfVectorizer() default features: lowercase word tokens of
    * ≥2 word-chars (token_pattern \b\w\w+\b). */
  def sklearnWords(s: String): Seq[String] =
    "\\b\\w\\w+\\b".r.findAllIn(s.toLowerCase(java.util.Locale.ROOT)).toSeq

  /** word 1-2 grams + char 2-3 grams (disambiguation context features). */
  def contextFeatures(s: String): Seq[String] = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    lower.split(" ").toSeq ++ wordNgrams(lower, 2) ++
      charNgrams(lower, 2).map("c2:" + _) ++ charNgrams(lower, 3).map("c3:" + _)
  }
}

final class TfIdfVectorizer(
    val vocab: Map[String, Int],
    val idf: Array[Double],
    featurize: String => Seq[String]
) extends Serializable {

  def transform(s: String): SparseVec = {
    val counts = mutable.HashMap.empty[Int, Double]
    featurize(s).foreach { f =>
      vocab.get(f).foreach(i => counts(i) = counts.getOrElse(i, 0.0) + 1.0)
    }
    val idx = counts.keys.toArray.sorted
    val vals = idx.map(i => counts(i) * idf(i))
    val norm = math.sqrt(vals.map(v => v * v).sum)
    SparseVec(idx, if (norm > 0) vals.map(_ / norm) else vals)
  }
}

object TfIdfVectorizer {
  def fit(corpus: Seq[String], featurize: String => Seq[String]): TfIdfVectorizer = {
    val df = mutable.HashMap.empty[String, Int]
    corpus.foreach { docStr =>
      featurize(docStr).distinct.foreach(f => df(f) = df.getOrElse(f, 0) + 1)
    }
    val vocab = df.keys.toSeq.sorted.zipWithIndex.toMap
    val n = corpus.size.toDouble
    val idf = new Array[Double](vocab.size)
    df.foreach { case (f, d) =>
      idf(vocab(f)) = math.log((1.0 + n) / (1.0 + d)) + 1.0
    }
    new TfIdfVectorizer(vocab, idf, featurize)
  }
}

/** Per-parser fuzzy synonym index: tf-idf char-bigram vectors of every
  * synonym norm (ref DictionaryIndex, kazu/utils/link_index.py:26-139).
  */
final class SynonymTfIdfIndex(
    val vectorizer: TfIdfVectorizer,
    val synNorms: Array[String],
    val vectors: Array[SparseVec]
) extends Serializable {

  /** Top-n fuzzy matches of a query norm, scores scaled ×100
    * (ref link_index.py:96-108). */
  def search(queryNorm: String, topN: Int): Seq[(String, Double)] = {
    val q = vectorizer.transform(queryNorm)
    if (q.indices.isEmpty) return Seq.empty
    val scored = new Array[(String, Double)](synNorms.length)
    var i = 0
    while (i < synNorms.length) {
      scored(i) = (synNorms(i), q.dot(vectors(i)) * 100.0)
      i += 1
    }
    scored.sortBy { case (s, sc) => (-sc, s) }.take(topN).filter(_._2 > 0.0)
  }
}

object SynonymTfIdfIndex {
  def fit(synNorms: Seq[String]): SynonymTfIdfIndex = {
    val sorted = synNorms.distinct.sorted.toArray
    val vec = TfIdfVectorizer.fit(
      sorted.toIndexedSeq,
      s => Featurizer.charBigrams(s.toLowerCase(java.util.Locale.ROOT)))
    new SynonymTfIdfIndex(vec, sorted, sorted.map(s =>
      vec.transform(s.toLowerCase(java.util.Locale.ROOT))))
  }
}
