package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ner.OpsinNer
import graft.ner.OpsinNer._

/** C9 chemistry half (OpsinStep): extendString boundary repair, the
  * longest-first resolve ladder, entity replacement semantics, the
  * zero-mappings / entity-class / document-condition gates, and the
  * mini-IUPAC resolver — replaying the reference's test_opsin.py
  * parametrized cases and opsin.py edge paths. */
class OpsinNerSpec extends AnyFunSuite with SparkTestBase {

  // ---- extendString: the reference's parametrized table ---------------------
  // (test_opsin.py TestOpsinExtendString; match strings are unique per
  // section, entity span located with indexOf exactly as the tests do)

  private def extend(matchStr: String, section: String, spaces: Int): Seq[String] = {
    val s = section.indexOf(matchStr)
    assert(s >= 0, s"'$matchStr' not in '$section'")
    val res = OpsinNer.extendString(s, s + matchStr.length, section, spaces)
    // invariant asserted by the reference test: every candidate's span
    // re-slices to its string
    res.foreach { case (m, st, en) => assert(section.substring(st, en) == m) }
    res.map(_._1)
  }

  private val simpleSection =
    "some entity with spaces between it that hasn't been recognised properly"

  test("extendString: single word, no spaces") {
    for (section <- Seq(simpleSection, "some entity", "entity");
         m <- Seq("entity", "ity"))
      assert(extend(m, section, 0) == Seq("entity"))
  }

  test("extendString: multi word, no spaces") {
    for (section <- Seq(simpleSection, "some entity with spaces", "entity with spaces");
         m <- Seq("entity with spaces", "ity with spaces", "ity with spa"))
      assert(extend(m, section, 0) == Seq("entity with spaces"))
  }

  test("extendString: single word, 2 spaces — longest first") {
    for (section <- Seq(simpleSection, "some entity with spaces", "entity with spaces");
         m <- Seq("entity", "ity"))
      assert(extend(m, section, 2) ==
        Seq("entity with spaces", "entity with", "entity"))
  }

  test("extendString: multi word, 2 spaces") {
    for (section <- Seq(simpleSection, "some entity with spaces between",
           "entity with spaces between");
         m <- Seq("entity with", "ity wi"))
      assert(extend(m, section, 2) ==
        Seq("entity with spaces between", "entity with spaces", "entity with"))
  }

  test("extendString: break right before section end keeps both candidates") {
    // loop exits at end-of-section right after consuming the break — the
    // full extension (incl. trailing break) is still appended as a distinct
    // candidate, exactly as the reference's last_result handling does
    assert(extend("entity", "entity ", 1) == Seq("entity ", "entity"))
  }

  test("extendString: non-break punctuation is traversed (hyphens, dots)") {
    // '-' and '.' are NOT IUPAC breaks — a transformer match truncated at
    // the first hyphen extends through the rest of the name
    assert(extend("propan", "a propan-1-ol b", 0) == Seq("propan-1-ol"))
  }

  // ---- MiniIupacResolver -----------------------------------------------------

  test("resolver: grammar derivations") {
    assert(MiniIupacResolver.nameToStructure("methane") == Right("C"))
    assert(MiniIupacResolver.nameToStructure("ethane") == Right("CC"))
    assert(MiniIupacResolver.nameToStructure("decane") == Right("C" * 10))
    assert(MiniIupacResolver.nameToStructure("cyclohexane") == Right("C1CCCCC1"))
    assert(MiniIupacResolver.nameToStructure("propan-1-ol") == Right("C(O)CC"))
    assert(MiniIupacResolver.nameToStructure("butan-2-amine") == Right("CC(N)CC"))
  }

  test("resolver: case-insensitive like OPSIN") {
    assert(MiniIupacResolver.nameToStructure("Cyclohexane") == Right("C1CCCCC1"))
    assert(MiniIupacResolver.nameToStructure("PROPAN-1-OL") == Right("C(O)CC"))
  }

  test("resolver: mirror-locant canonicalization (the RDKit CanonSmiles role)") {
    // butan-3-amine and butan-2-amine are the same molecule — one idx
    assert(MiniIupacResolver.nameToStructure("butan-3-amine") ==
      MiniIupacResolver.nameToStructure("butan-2-amine"))
    assert(MiniIupacResolver.nameToStructure("propan-3-ol") ==
      MiniIupacResolver.nameToStructure("propan-1-ol"))
    // on a ring every mono-substituted position is equivalent
    assert(MiniIupacResolver.nameToStructure("cyclohexan-4-ol") ==
      MiniIupacResolver.nameToStructure("cyclohexan-1-ol"))
  }

  test("resolver: failures are Left, never throws") {
    // the reference's own unparseable doc example family
    assert(MiniIupacResolver.nameToStructure(
      "1,4:3,6-dianhydro-2,5-di-O-Nitro-D-glucitol").isLeft)
    assert(MiniIupacResolver.nameToStructure("").isLeft)
    assert(MiniIupacResolver.nameToStructure("butan-9-ol").isLeft)    // bad locant
    assert(MiniIupacResolver.nameToStructure("cycloethane").isLeft)   // 2-carbon ring
    assert(MiniIupacResolver.nameToStructure("methane yes").isLeft)   // break char
  }

  // ---- processDoc ------------------------------------------------------------

  private def drugEnt(text: String, matchStr: String,
      cls: String = "drug", mappings: Seq[Mapping] = Seq.empty): Mention = {
    val s = text.indexOf(matchStr)
    Mention(matchStr, cls, Seq(CharSpan(s, s + matchStr.length)), "test",
      MentionConfidence.Probable,
      graft.text.Normalizer.normalize(matchStr, cls), mappings = mappings)
  }

  private def doc(text: String, ents: Mention*): KDoc =
    KDoc("u://d", new java.sql.Timestamp(0L), text, "en",
      Seq(Section("body", text, ents)))

  test("truncated drug entity is extended, resolved, and REPLACED") {
    val text = "take propan-1-ol daily"
    val d = doc(text, drugEnt(text, "propan")) // transformer-style truncation
    val out = OpsinNer.processDoc(Config(), MiniIupacResolver)(d)
    val ents = out.sections.head.entities
    assert(ents.size == 1)
    val e = ents.head
    assert(e.matchStr == "propan-1-ol")
    assert(e.spans == Seq(CharSpan(5, 16)))
    // match_norm recomputed — the reference's dataclasses.replace re-runs
    // __post_init__ (kazu/data/__init__.py:322-324)
    assert(e.matchNorm == graft.text.Normalizer.normalize("propan-1-ol", "drug"))
    assert(e.mappings == Seq(Mapping("propan-1-ol", "Opsin", "Opsin", "C(O)CC",
      OpsinNer.Namespace, StringMatchConfidence.HighlyLikely, None, None)))
  }

  test("longest-first ladder: unparseable long candidates fall back to the name") {
    val text = "x methane was found"
    val d = doc(text, drugEnt(text, "meth"))
    val out = OpsinNer.processDoc(Config(), MiniIupacResolver)(d)
    val e = out.sections.head.entities.head
    // "methane was found" and "methane was" fail; "methane" parses
    assert(e.matchStr == "methane" && e.mappings.head.idx == "C")
  }

  test("replacement lands at the END of the section entity list (remove+append)") {
    val text = "aspirin then methane now"
    val other = drugEnt(text, "aspirin",
      mappings = Seq(Mapping("aspirin", "TEST", "tp", "T:1", "ts",
        StringMatchConfidence.HighlyLikely, None, None)))
    val d = doc(text, drugEnt(text, "meth"), other)
    val out = OpsinNer.processDoc(Config(), MiniIupacResolver)(d)
    assert(out.sections.head.entities.map(_.matchStr) == Seq("aspirin", "methane"))
  }

  test("gates: wrong class, pre-mapped, and unresolvable entities are untouched") {
    val text = "see glucitol-x near methane with ethane"
    val wrongClass = drugEnt(text, "methane", cls = "gene")
    val preMapped = drugEnt(text, "ethane",
      mappings = Seq(Mapping("ethane", "TEST", "tp", "T:2", "ts",
        StringMatchConfidence.HighlyLikely, None, None)))
    val unresolvable = drugEnt(text, "glucitol")
    val d = doc(text, wrongClass, preMapped, unresolvable)
    val out = OpsinNer.processDoc(Config(), MiniIupacResolver)(d)
    assert(out == d) // nothing eligible resolved → document unchanged
  }

  test("document condition: no required-class entity → document skipped whole") {
    val text = "methane here"
    val d = doc(text, drugEnt(text, "meth"))
    val cfg = Config(requiredEntityClasses = Some(Set("gene")))
    assert(OpsinNer.processDoc(cfg, MiniIupacResolver)(d) == d)
    // and with the condition satisfied the same doc resolves
    val cfg2 = Config(requiredEntityClasses = Some(Set("drug")))
    val out = OpsinNer.processDoc(cfg2, MiniIupacResolver)(d)
    assert(out.sections.head.entities.head.mappings.nonEmpty)
  }

  test("linking candidates survive the replacement (dataclasses.replace carries them)") {
    val text = "z methane q"
    val cand = CandidateWithMetrics(
      LinkingCandidate("p", "meth", Seq("meth"), isSymbolic = false,
        Seq("syn"), Seq(EquivalentIdSet(Seq(IdAndSource("X:1", "X")))), "UNAMBIGUOUS"),
      LinkingMetrics(exactMatch = Some(true)))
    val ent = drugEnt(text, "meth").copy(candidates = Seq(cand))
    val out = OpsinNer.processDoc(Config(), MiniIupacResolver)(doc(text, ent))
    assert(out.sections.head.entities.head.candidates == Seq(cand))
  }

  test("two value-equal eligible mentions each get their own replacement") {
    // the reference keys replacements on Entity OBJECT identity, so two
    // equal mentions (same span from two NER sources) both survive as two
    // replaced entities — position keying reproduces that; value keying
    // would shrink the list from 2 to 1
    val text = "x methane y"
    val e = drugEnt(text, "meth")
    val out = OpsinNer.processDoc(Config(), MiniIupacResolver)(doc(text, e, e))
    val ents = out.sections.head.entities
    assert(ents.size == 2 && ents.forall(_.matchStr == "methane"))
    assert(ents.forall(_.mappings.head.idx == "C"))
  }

  test("dataset plane: narrow mapPartitions over KDocs") {
    import spark.implicits._
    val texts = Seq("a methane b", "c dianhydro-glucitol d")
    val docs = spark.createDataset(texts.map(t => doc(t, drugEnt(t,
      t.split(" ")(1).take(4)))))
    val out = OpsinNer.annotate(spark, docs, () => MiniIupacResolver).collect()
    assert(out.flatMap(_.entities).count(_.mappings.exists(_.source == "Opsin")) == 1)
    // the plan stays shuffle-free: one deserialize → map → serialize chain
    val plan = OpsinNer.annotate(spark, docs, () => MiniIupacResolver)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
