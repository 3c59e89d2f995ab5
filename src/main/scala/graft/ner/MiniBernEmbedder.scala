package graft.ner

import graft.text.Similarity

/** The default string encoder for embedding linking (D3) and the embedding
  * string scorer (D4/E6/E13): [[MiniBern.encode]] over the executor-pinned
  * model session — the same trunk and weight memo the NER stage uses, so
  * the embedding-linking path carries real transformer inference cost (the
  * SapBERT slot, kazu/utils/sapbert.py:84-254 /
  * string_similarity_scorers.py:94-133; production swaps the session for an
  * exported encoder without touching callers).
  *
  * Encodings are memoized per JVM with a bounded map (entries are pure
  * functions of the string; a full clear on overflow just re-encodes on
  * demand), mirroring the reference's embedding caches.
  */
object MiniBernEmbedder extends Similarity.Embedder {
  private val MaxEntries = 1 << 16
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Float]]()

  def embed(s: String): Array[Float] = {
    var v = cache.get(s)
    if (v == null) {
      v = TokenClassifier.executorMiniBern.encode(s)
      if (cache.size >= MaxEntries) cache.clear()
      cache.put(s, v)
    }
    v
  }
}
