package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{CharSpan, Mention, MentionConfidence, Section}
import graft.ner.SpacyObjectMapper

/** Port of the reference's test_spacy_object_mapper.py (the last
  * previously-unported reference test now that the C8 plane exists):
  * sample section with five entities across five classes, incremental and
  * non-incremental extension-attribute modes. */
class SpacyObjectMapperSpec extends AnyFunSuite {

  private val sampleText =
    """Paracetamol is a drug.
      |EGFR is a gene.
      |NSCLC is a disease.
      |Hand is an anatomical entity.
      |AstraZeneca is a company.
      |""".stripMargin

  private def ent(m: String, cls: String): Mention = {
    val start = sampleText.indexOf(m)
    require(start >= 0, m)
    Mention(m, cls, Seq(CharSpan(start, start + m.length)), "test",
      MentionConfidence.HighlyLikely, graft.text.Normalizer.normalize(m, cls))
  }

  private val paracetamol = ent("Paracetamol", "drug")
  private val egfr = ent("EGFR", "gene")
  private val nsclc = ent("NSCLC", "disease")
  private val hand = ent("Hand", "anatomy")
  private val az = ent("AstraZeneca", "company")
  private val section = Section("sample", sampleText,
    entities = Seq(paracetamol, egfr, nsclc, hand, az))
  private val drugGeneAndDisease = Set("drug", "gene", "disease")

  // ref test_object_mapper_incremental_attributes (empty + part-populated)
  for ((label, initial) <- Seq(
      ("empty_entity_classes", Set.empty[String]),
      ("part_populated_entity_classes", drugGeneAndDisease)))
    test(s"incremental attributes: $label") {
      val mapper = new SpacyObjectMapper(initial, setAttributesIncrementally = true)
      val mapped = mapper(section)
      assert(mapped.entries.size == section.entities.size)
      mapped.entries.foreach { case (e, span) =>
        (span.start until span.end).foreach { t =>
          assert(mapped.tokenAttr(t, e.entityClass), s"${e.matchStr} tok $t")
        }
      }
      // mapper should have all entity classes now (one class per entity)
      assert(mapper.entityClasses.size == section.entities.size)
    }

  // ref test_object_mapper_non_incremental_attributes
  test("non-incremental: uncovered classes keep their span but no attribute " +
    "and no registration") {
    val mapper = new SpacyObjectMapper(drugGeneAndDisease)
    val mapped = mapper(section)
    assert(mapped.entries.size == section.entities.size)
    for (e <- Seq(paracetamol, egfr, nsclc)) {
      val span = mapped.spanOf(e).get
      (span.start until span.end).foreach(t => assert(mapped.tokenAttr(t, e.entityClass)))
    }
    for (e <- Seq(hand, az)) {
      assert(!mapper.hasExtension(e.entityClass))
      val span = mapped.spanOf(e).get // the span itself IS returned (ref continue)
      (span.start until span.end).foreach(t => assert(!mapped.tokenAttr(t, e.entityClass)))
    }
    assert(mapper.entityClasses == drugGeneAndDisease)
  }

  test("expand alignment: a partial character overlap widens to full tokens; " +
    "an entity in whitespace maps to nothing") {
    val text = "alpha beta gamma"
    val m1 = Mention("lpha b", "x", Seq(CharSpan(1, 7)), "test",
      MentionConfidence.HighlyLikely, "LPHA B")
    val m2 = Mention(" ", "x", Seq(CharSpan(5, 6)), "test",
      MentionConfidence.HighlyLikely, "")
    val mapper = new SpacyObjectMapper(Set("x"))
    val mapped = mapper(Section("s", text, entities = Seq(m1, m2)))
    // [1,7) overlaps "alpha" and "beta" -> tokens 0..2
    assert(mapped.spanOf(m1).contains(mapper.TokenSpan(0, 2)))
    // the single space [5,6) touches no token under this tokenizer
    assert(mapped.spanOf(m2).isEmpty)
  }

  test("value-equal duplicate entities keep one entry EACH (the reference " +
    "dict is keyed by object identity)") {
    val dup = ent("EGFR", "gene")
    val mapper = new SpacyObjectMapper(Set("gene"))
    val mapped = mapper(Section("s", sampleText, entities = Seq(egfr, dup)))
    assert(mapped.entries.size == 2)
    assert(mapped.entries.map(_._2).distinct.size == 1) // same span, twice
  }
}
