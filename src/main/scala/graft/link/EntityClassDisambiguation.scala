package graft.link

import graft.model._
import graft.index.{Featurizer, TfIdfVectorizer, SparseVec}

/** Entity-class disambiguation for span-identical entities of different
  * classes (ref EntityClassDisambiguationStep,
  * kazu/steps/linking/entity_class_disambiguation.py:34-193).
  *
  * Config: per ambiguous surface span, one expected-context corpus + score
  * threshold per candidate class ("UCB" → anatomy context vs company
  * context). A tf-idf model per (span, class) scores the mention's
  * ±1-sentence window; the best class ≥ its threshold keeps its entities,
  * every other span-sharing entity is dropped; if no class clears its
  * threshold, all are dropped.
  */
object EntityClassDisambiguation {

  final case class DisambiguationEntry(
      entityClass: String,
      relevantText: Seq[String],
      thresh: Double
  ) extends Serializable

  final case class Config(context: Map[String, Seq[DisambiguationEntry]])
      extends Serializable {
    def isEmpty: Boolean = context.isEmpty

    /** (span → per-class fitted model + document vector + threshold). */
    @transient lazy val models: Map[String, Seq[(String, TfIdfVectorizer, SparseVec, Double)]] =
      context.map { case (span, entries) =>
        span -> entries.map { e =>
          // sklearn TfidfVectorizer() defaults (word unigrams), as the
          // reference constructs per disambiguation entry
          val vec = TfIdfVectorizer.fit(e.relevantText, Featurizer.sklearnWords)
          // document vector = sum of the corpus docs' vectors (the
          // reference dots the query against the fit matrix data)
          val docVecs = e.relevantText.map(vec.transform)
          val combined = docVecs.reduceLeft { (a, b) =>
            val idx = (a.indices ++ b.indices).distinct.sorted
            val am = a.indices.zip(a.values).toMap
            val bm = b.indices.zip(b.values).toMap
            SparseVec(idx, idx.map(i => am.getOrElse(i, 0.0) + bm.getOrElse(i, 0.0)))
          }
          (e.entityClass, vec, combined, e.thresh)
        }
      }
  }

  /** ±window/2-sentence context around the entity
    * (ref sentence_context_for_entity :128-146). */
  def sentenceContext(e: Mention, s: Section, window: Int = 3): String = {
    val sents = s.sentenceSpans
    if (sents.isEmpty) return s.text
    val idx = sents.indexWhere(sp =>
      e.spans.exists(es => sp.start <= es.start && es.end <= sp.end))
    if (idx < 0) return s.text
    val start = math.max(0, idx - window / 2)
    val end = math.min(sents.size - 1, idx + window / 2)
    s.text.substring(sents(start).start, sents(end).end)
  }

  def processDoc(cfg: Config)(doc: KDoc): KDoc = {
    if (cfg.isEmpty || doc.error.isDefined) return doc
    doc.copy(sections = doc.sections.map { section =>
      // group span-sharing entities whose match is configured
      val groups = section.entities
        .filter(e => cfg.context.contains(e.matchStr))
        .groupBy(_.spans)
        .values.filter(_.size > 1)
      if (groups.isEmpty) section
      else {
        val toDrop = scala.collection.mutable.Set.empty[Mention]
        groups.foreach { ents =>
          val rep = ents.head
          val context = sentenceContext(rep, section)
          val scored = cfg.models(rep.matchStr).map {
            case (cls, vec, docVec, thresh) =>
              (cls, vec.transform(context).dot(docVec), thresh)
          }
          val best = scored.filter { case (_, sc, th) => sc >= th }
            .sortBy { case (cls, sc, _) => (-sc, cls) }
            .headOption
          best match {
            case Some((winnerClass, _, _)) =>
              toDrop ++= ents.filterNot(_.entityClass == winnerClass)
            case None => toDrop ++= ents
          }
        }
        section.copy(entities = section.entities.filterNot(toDrop.contains))
      }
    })
  }
}
