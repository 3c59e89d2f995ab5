package graft.ner

import graft.model.{Mention, Section}
import graft.text.Tokenizer

/** Port of `KazuToSpacyObjectMapper`
  * (kazu/utils/spacy_object_mapper.py:8-97): maps a [[Section]]'s entities
  * onto the token model of the basic pipeline — the reference's
  * `basic_spacy_pipeline` is a blank pipeline (tokenizer + sentencizer),
  * here the repo's deterministic [[Tokenizer]], the same stand-in the C8
  * step plane uses.
  *
  * Pinned semantics (SpacyObjectMapperSpec ports the reference's own test):
  *  - `char_span(start, end, alignment_mode="expand")` — the token range
  *    overlapping [start, end) expands partial overlaps to full tokens; an
  *    entity overlapping NO token maps to nothing (spacy_object_mapper
  *    .py:80-87);
  *  - the custom-extension registry: classes passed to the constructor get
  *    "set_extension" up front (:67-68); an UNREGISTERED class still maps
  *    to a span but its token attributes are NOT set unless
  *    `setAttributesIncrementally`, in which case the class is registered
  *    on first sight (:88-97 — including the reference's subtle
  *    `continue`, which skips only the attribute write, not the span);
  *  - token attributes: `token._.set(entity_class, True)` for every token
  *    of every mapped span of a registered class (:94-96).
  */
final class SpacyObjectMapper(
    initialClasses: Set[String] = Set.empty,
    setAttributesIncrementally: Boolean = false) {

  // the extension registry mutates in incremental mode; an executor-pinned
  // mapper is shared across task threads (the C8 session pattern), so all
  // access synchronizes on the set
  private val registered = scala.collection.mutable.LinkedHashSet.empty[String]
  registered ++= initialClasses

  /** The mapper's known classes (ref `self.entity_classes`). */
  def entityClasses: Set[String] = registered.synchronized(registered.toSet)

  /** `Token.has_extension` analogue (the non-incremental test's probe). */
  def hasExtension(cls: String): Boolean =
    registered.synchronized(registered.contains(cls))

  /** Half-open token-index range. */
  final case class TokenSpan(start: Int, end: Int)

  /** One entry per mapped entity OCCURRENCE, in entity order — the
    * reference returns a dict keyed by Python object identity, so two
    * value-equal duplicate entities each keep their own entry (a
    * value-keyed Map would silently collapse them). */
  final case class MappedSection(
      tokens: IndexedSeq[Tokenizer.Token],
      entries: Seq[(Mention, TokenSpan)],
      attrs: Set[(Int, String)]) {
    /** `token._.get(cls)` for token index `tok` of this call's doc. */
    def tokenAttr(tok: Int, cls: String): Boolean = attrs((tok, cls))
    /** First entry for a value-equal mention (test convenience). */
    def spanOf(m: Mention): Option[TokenSpan] =
      entries.collectFirst { case (e, s) if e == m => s }
  }

  /** Documented deviation (ADVICE r7): spaCy's `Doc.char_span` returns None
    * for an out-of-bounds `end` even with alignment_mode="expand"
    * (token_by_char yields -1); this port clamps such a span to the last
    * token instead. Unreachable in practice — entity offsets are derived
    * from the same text — and kept as-is because the step's oracle rows pin
    * the current behaviour. */
  private def charSpanExpand(
      toks: IndexedSeq[Tokenizer.Token], start: Int, end: Int): Option[TokenSpan] = {
    val s = toks.indexWhere(t => t.end > start)
    if (s < 0) return None
    var e = s
    while (e < toks.length && toks(e).start < end) e += 1
    if (e == s) None else Some(TokenSpan(s, e))
  }

  def apply(section: Section): MappedSection = {
    val toks = Tokenizer.tokenize(section.text).toIndexedSeq
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Mention, TokenSpan)]
    val attrs = scala.collection.mutable.Set.empty[(Int, String)]
    section.entities.foreach { ent =>
      charSpanExpand(toks, ent.start, ent.end).foreach { span =>
        entries += ((ent, span))
        val cls = ent.entityClass
        val setAttr = registered.synchronized {
          if (registered.contains(cls)) true
          else if (setAttributesIncrementally) { registered += cls; true }
          else false // ref :96-97 — span kept, attributes skipped
        }
        if (setAttr)
          (span.start until span.end).foreach(t => attrs += ((t, cls)))
      }
    }
    MappedSection(toks, entries.toSeq, attrs.toSet)
  }
}
