package graft

/** Single parse site for the tinybern-style golden fixture
  * (src/test/resources/minibern_golden.tsv: space-separated
  * `word BIO-label` lines, sentences delimited by blank lines) — shared by
  * MiniBernSpec and Int8QuantizerSpec so a format change has ONE place to
  * land.
  */
object GoldenCorpus {
  val path = "src/test/resources/minibern_golden.tsv"

  /** Sentences as (word, BIO-label) rows. */
  def sentences(): Seq[Seq[(String, String)]] = {
    val src = scala.io.Source.fromFile(path)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
      val cur = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      src.getLines().foreach { line =>
        if (line.isEmpty) { if (cur.nonEmpty) { out += cur.toSeq; cur.clear() } }
        else { val Array(w, l) = line.split(" ", 2); cur += ((w, l)) }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    } finally src.close()
  }

  /** Distinct lowercased word inventory across all sentences. */
  def tokens(): Seq[String] =
    sentences().flatten.map(_._1.toLowerCase(java.util.Locale.ROOT)).distinct
}
