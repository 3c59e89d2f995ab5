package graft.link

import graft.model._
import graft.text.Tokenizer

/** Rules-based entity-class disambiguation filter (ref
  * RulesBasedEntityClassDisambiguationFilterStep,
  * kazu/steps/linking/rules_based_disambiguation.py:37-288).
  *
  * Token-pattern TP/FP rules are evaluated against the SENTENCE containing
  * each mention; results OR-aggregate document-wide per key
  * (match, entity_class). An entity is dropped if its key has TP rules that
  * never fired anywhere in the doc, or an FP rule that fired anywhere.
  * The reference uses spaCy Matcher patterns; here a small deterministic
  * token-constraint engine over the Tokenizer's tokens plays that role.
  */
object ClassFilter {

  /** One token constraint (subset of spaCy pattern keys the reference's
    * rules use: LOWER exact / LOWER IN / entity-class flag). */
  final case class TokenRule(
      lower: Option[String] = None,
      lowerIn: Option[Set[String]] = None,
      entityClass: Option[String] = None
  ) extends Serializable

  type Pattern = Seq[TokenRule]

  final case class Rules(
      classRules: Map[String, Map[String, Seq[Pattern]]] = Map.empty,
      // entity class → mention lower → tp/fp → patterns
      mentionRules: Map[String, Map[String, Map[String, Seq[Pattern]]]] = Map.empty
  ) extends Serializable {
    def isEmpty: Boolean = classRules.isEmpty && mentionRules.isEmpty
  }

  private final case class SentCtx(
      tokens: IndexedSeq[String],
      tokenSpans: IndexedSeq[CharSpan],
      classesAt: IndexedSeq[Set[String]]
  )

  private def matches(p: Pattern, ctx: SentCtx): Boolean = {
    if (p.isEmpty) return false
    var i = 0
    while (i + p.length <= ctx.tokens.length) {
      var ok = true
      var k = 0
      while (ok && k < p.length) {
        val r = p(k)
        val tok = ctx.tokens(i + k)
        val lower = tok.toLowerCase(java.util.Locale.ROOT)
        if (r.lower.exists(_ != lower)) ok = false
        if (ok && r.lowerIn.exists(!_.contains(lower))) ok = false
        if (ok && r.entityClass.exists(c => !ctx.classesAt(i + k).contains(c)))
          ok = false
        k += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  def processDoc(rules: Rules)(doc: KDoc): KDoc = {
    if (rules.isEmpty || doc.error.isDefined) return doc

    // (key, ruleset) → (tpConfigured, tpFired, fpFired); class rules and
    // mention rules evaluate INDEPENDENTLY — failing either drops the key
    // (ref rules_based_disambiguation.py:248-260: class and mention matcher
    // results are separate checks on the same (match, class) key)
    val state = scala.collection.mutable.HashMap
      .empty[(String, String, String), (Boolean, Boolean, Boolean)]

    def rulesFor(e: Mention): Seq[(String, Map[String, Seq[Pattern]])] = {
      val cls = rules.classRules.get(e.entityClass).map("class" -> _)
      val mention = rules.mentionRules.get(e.entityClass)
        .flatMap(_.get(e.matchStr.toLowerCase(java.util.Locale.ROOT)))
        .map("mention" -> _)
      cls.toSeq ++ mention.toSeq
    }

    // pass 1: evaluate rules in sentence contexts, OR-aggregate per key
    doc.sections.foreach { s =>
      val sents =
        if (s.sentenceSpans.nonEmpty) s.sentenceSpans
        else Tokenizer.sentenceSpans(s.text)
      val toks = Tokenizer.tokenize(s.text)
      lazy val classAt: Array[Set[String]] = {
        val arr = Array.fill(toks.length)(Set.empty[String])
        s.entities.foreach { e =>
          toks.indices.foreach { ti =>
            if (toks(ti).start < e.end && e.start < toks(ti).end)
              arr(ti) += e.entityClass
          }
        }
        arr
      }
      s.entities.foreach { e =>
        rulesFor(e).foreach { case (which, tpFp) =>
          val sent = sents.find(sp => sp.start <= e.start && e.start < sp.end)
            .getOrElse(CharSpan(0, s.text.length))
          val idxs = toks.indices.filter(ti =>
            toks(ti).start >= sent.start && toks(ti).end <= sent.end)
          val ctx = SentCtx(
            idxs.map(ti => s.text.substring(toks(ti).start, toks(ti).end)).toIndexedSeq,
            idxs.map(ti => CharSpan(toks(ti).start, toks(ti).end)).toIndexedSeq,
            idxs.map(classAt(_)).toIndexedSeq)
          val key = (e.matchStr, e.entityClass, which)
          val tpPatterns = tpFp.getOrElse("tp", Seq.empty)
          val fpPatterns = tpFp.getOrElse("fp", Seq.empty)
          val (cfg0, tp0, fp0) =
            state.getOrElse(key, (tpPatterns.nonEmpty, false, false))
          state(key) = (
            cfg0 || tpPatterns.nonEmpty,
            tp0 || tpPatterns.exists(matches(_, ctx)),
            fp0 || fpPatterns.exists(matches(_, ctx)))
        }
      }
    }

    // pass 2: drop entities whose key failed either ruleset
    doc.copy(sections = doc.sections.map { s =>
      s.copy(entities = s.entities.filterNot { e =>
        Seq("class", "mention").exists(which =>
          state.get((e.matchStr, e.entityClass, which)).exists {
            case (tpConfigured, tpFired, fpFired) =>
              (tpConfigured && !tpFired) || fpFired
          })
      })
    })
  }
}
