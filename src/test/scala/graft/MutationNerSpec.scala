package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.MutationNer
import graft.ner.MutationNer.MutationMention

/** C9 fixtures. The headline sentence is the reference's own SethRunnerTest
  * (kazu-jvm SethRunnerTest.scala:10-16: expects exactly 3 mentions); the
  * rest are canonical examples from the HGVS nomenclature (den Dunnen et
  * al. 2016) and the SETH / MutationFinder papers' pattern families.
  */
class MutationNerSpec extends AnyFunSuite {

  private def find(t: String): Seq[MutationMention] =
    MutationNer.findMutations(t)

  test("reference SethRunnerTest sentence yields exactly 3 mentions") {
    val text = "Causative GJB2 mutations were identified in 31 (15.2%) patients, " +
      "and two common mutations, c.35delG and L90P (c.269T>C), accounted for " +
      "72.1% and 9.8% of GJB2 disease alleles."
    val ms = find(text)
    assert(ms.size == 3)
    val byText = ms.map(m => m.text -> m).toMap
    val del = byText("c.35delG")
    assert(del.mutationType == "DELETION" && del.wtResidue == "G" &&
      del.nucleotideMutation && !del.proteinMutation && del.foundWith == "SETH")
    val mf = byText("L90P")
    assert(mf.mutationType == "SUBSTITUTION" && mf.foundWith == "MUTATIONFINDER" &&
      mf.hgvs == "p.Leu90Pro" && mf.ambiguous && mf.proteinMutation)
    val sub = byText("c.269T>C")
    assert(sub.mutationType == "SUBSTITUTION" && sub.wtResidue == "T" &&
      sub.mutResidue == "C" && sub.hgvs == "c.269T>C")
    // offsets index the original text exactly
    ms.foreach(m => assert(text.substring(m.start, m.end) == m.text))
  }

  test("nucleotide HGVS family") {
    assert(find("g.3420A>G").head.mutationType == "SUBSTITUTION")
    assert(find("the c.76_78del variant").head.mutationType == "DELETION")
    val delSeq = find("c.76_78delTTC").head
    assert(delSeq.mutationType == "DELETION" && delSeq.wtResidue == "TTC")
    val ins = find("carrying c.76_77insT here").head
    assert(ins.mutationType == "INSERTION" && ins.mutResidue == "T")
    val dup = find("c.35dupG").head
    assert(dup.mutationType == "DUPLICATION" && dup.wtResidue == "G")
    val delins = find("c.112_117delinsTG").head
    assert(delins.mutationType == "DELETION_INSERTION" && delins.mutResidue == "TG")
    assert(find("c.203_506inv").head.mutationType == "INVERSION")
    // UTR / intronic positions
    assert(find("c.-12A>T").head.text == "c.-12A>T")
    assert(find("c.88+2T>G").head.text == "c.88+2T>G")
    assert(find("c.*46del").head.text == "c.*46del")
    // m. / n. / r. prefixes are nucleotide-level
    assert(find("m.8993T>G").head.nucleotideMutation)
    assert(find("r.76a>u").isEmpty) // lowercase RNA bases are out of grammar
  }

  test("protein HGVS family normalizes to three-letter hgvs (ref test_seth.py)") {
    val s3 = find("p.Leu90Pro").head
    assert(s3.hgvs == "p.Leu90Pro" && s3.wtResidue == "L" && s3.mutResidue == "P")
    val s1 = find("p.L90P").head
    assert(s1.hgvs == "p.Leu90Pro" && s1.foundWith == "SETH")
    val ter = find("p.Trp26Ter").head
    assert(ter.hgvs == "p.Trp26Ter" && ter.mutationType == "SUBSTITUTION")
    val star = find("p.*90Leu").head
    assert(star.wtResidue == "*" && star.mutResidue == "L")
    val paren = find("the p.(Trp26Ter) variant").head
    assert(paren.text == "p.(Trp26Ter)" && paren.hgvs == "p.Trp26Ter")
    val del = find("p.Leu90del").head
    assert(del.mutationType == "DELETION" && del.hgvs == "p.Leu90del")
    val dup = find("p.Ala3_Ser5dup").head
    assert(dup.mutationType == "DUPLICATION" && dup.hgvs == "p.Ala3_Ser5dup")
    val ins = find("p.Lys2_Gly3insGlnSer").head
    assert(ins.mutationType == "INSERTION" && ins.mutResidue == "QS" &&
      ins.hgvs == "p.Lys2_Gly3insGlnSer")
    val silent = find("p.Cys188=").head
    assert(silent.mutationType == "SILENT" && silent.hgvs == "p.Cys188=")
  }

  test("frameshift family") {
    val fs = find("p.Arg97fs").head
    assert(fs.mutationType == "FRAMESHIFT" && fs.hgvs == "p.Arg97fs")
    val fsLong = find("p.Arg97ProfsTer23").head
    // the normalized form keeps the new residue: distinct frameshifts
    // (ProfsTer23 vs SerfsTer23) must not collapse to one normalized key
    assert(fsLong.hgvs == "p.Arg97ProfsTer23" && fsLong.mutResidue == "P")
    assert(find("p.Arg97SerfsTer23").head.hgvs == "p.Arg97SerfsTer23")
    // the "*" and "Ter" stop spellings normalize to one key
    val fsStar = find("p.Arg97fs*23").head
    assert(fsStar.hgvs == "p.Arg97fsTer23")
  }

  test("free-text and dbSNP planes") {
    val e6v = find("the sickle mutation E6V in HBB").head
    assert(e6v.foundWith == "MUTATIONFINDER" && e6v.hgvs == "p.Glu6Val" && e6v.ambiguous)
    val l3 = find("a Leu90Pro substitution").head
    assert(l3.foundWith == "MUTATIONFINDER" && l3.hgvs == "p.Leu90Pro" && !l3.ambiguous)
    val rs = find("associated with rs2306220 in SLC30A8").head
    assert(rs.mutationType == "DBSNP" && rs.hgvs == "rs2306220" &&
      !rs.proteinMutation && !rs.nucleotideMutation)
  }

  test("boundaries and non-matches") {
    // T3A and E2F both fire the wNm pattern — E2F is the canonical
    // MutationFinder false positive, which is exactly why one-letter
    // matches carry ambiguous=true (the downstream filter's signal)
    val wnm = find("T3A cells and E2F transcription factor")
    assert(wnm.size == 2 && wnm.forall(_.ambiguous))
    assert(find("E2E is silent-like and must not fire").isEmpty) // wt == mut
    assert(find("XL90P").isEmpty)   // left boundary
    assert(find("L90PX").isEmpty)   // right boundary
    assert(find("vers1on c.1 numbers").isEmpty)
    assert(find("rs12x34").isEmpty)
    // unbalanced parenthesis: the grammar plane rejects, but the free-text
    // plane still (correctly) reads the inner Leu90Pro
    val unbal = find("p.(Leu90Pro")
    assert(unbal.size == 1 && unbal.head.foundWith == "MUTATIONFINDER")
    assert(find("the word dup alone").isEmpty)
  }

  test("parenthesized literature form keeps the mention, trims the paren") {
    // "(p.Leu90Pro)": the open paren precedes `p.` (outside the match), the
    // sentence's close paren lands in the optional close group — the mention
    // must survive with the paren trimmed from its span (was: dropped whole)
    val t = "the variant c.269T>C (p.Leu90Pro) was detected"
    val prot = find(t).filter(_.proteinMutation)
    assert(prot.size == 1)
    val p = prot.head
    assert(p.text == "p.Leu90Pro" && p.hgvs == "p.Leu90Pro" && p.foundWith == "SETH")
    assert(t.substring(p.start, p.end) == "p.Leu90Pro")
    // same for the other three protein families
    val fs = find("a change (p.Arg83fs) here").filter(_.proteinMutation)
    assert(fs.size == 1 && fs.head.text == "p.Arg83fs"
      && fs.head.mutationType == "FRAMESHIFT")
    val rng = find("seen (p.Gly4_Gln6dup) there").filter(_.proteinMutation)
    assert(rng.size == 1 && rng.head.text == "p.Gly4_Gln6dup"
      && rng.head.mutationType == "DUPLICATION")
    val pt = find("and (p.Trp26del) too").filter(_.proteinMutation)
    assert(pt.size == 1 && pt.head.text == "p.Trp26del"
      && pt.head.mutationType == "DELETION")
    // uncertain HGVS syntax with BOTH parens inside the match is unchanged
    val both = find("the p.(Trp26Ter) variant").head
    assert(both.text == "p.(Trp26Ter)")
  }

  test("overlap resolution prefers the grammar plane and longest match") {
    // inside p.Leu90Pro the 3-letter MF pattern must not double-fire
    assert(find("p.Leu90Pro").size == 1)
    // adjacent mentions both survive
    assert(find("c.35delG and L90P (c.269T>C)").size == 3)
  }

  test("pipeline adapter emits SethStep-shaped mentions") {
    val ms = MutationNer.mentions("carrying c.269T>C today", "mutation")
    assert(ms.size == 1)
    val m = ms.head
    assert(m.entityClass == "mutation" && m.namespace == "MutationNer")
    assert(m.mappings.head.stringMatchConfidence == "PROBABLE")
    assert(m.mappings.head.idx == "mutation" && m.mappings.head.parserName == "n/a")
    assert(m.matchNorm == "c.269T>C")
  }

  test("reference test_seth scenarios: hgvs set + condition gating") {
    import graft.model.{KDoc, Section, CharSpan, Mention}
    // the reference's exact test text and expected normalized set
    // (test_seth.py:6-12): {"p.Leu90Pro", "c.269T>C", "c.35delG"}
    val text = "Causative GJB2 mutations were identified in 31 (15.2%) " +
      "patients, and two common mutations, c.35delG and L90P (c.269T>C), " +
      "accounted for 72.1% and 9.8% of GJB2 disease alleles."
    val ts = new java.sql.Timestamp(0L)
    def doc(ents: Seq[Mention]) = KDoc("u", ts, text, "en",
      Seq(Section("body", text, entities = ents)))
    val expected = Set("p.Leu90Pro", "c.269T>C", "c.35delG")

    // no condition → all three found with the reference's hgvs values
    val unconditional = graft.ner.MutationNer.processDoc("mutation")(doc(Seq.empty))
    assert(unconditional.entities.map(_.matchNorm).toSet == expected)

    // condition requiring a gene entity: a doc without one is SKIPPED
    // (passes through unchanged), with one it runs (test_seth.py:36-53)
    val cond = Some(graft.ner.MutationNer.requiredEntitiesCondition(Set("gene")))
    val skipped = graft.ner.MutationNer.processDoc("mutation", cond)(doc(Seq.empty))
    assert(skipped.entities.isEmpty)
    val gene = Mention("Causative", "gene", Seq(CharSpan(0, 5)), "test", 100, "CAUSATIVE")
    val ran = graft.ner.MutationNer.processDoc("mutation", cond)(doc(Seq(gene)))
    assert(ran.entities.filter(_.entityClass == "mutation")
      .map(_.matchNorm).toSet == expected)
  }

  test("seeded generator fuzz: 500 grammar mentions round-trip with exact spans") {
    // expectations are DERIVED FROM THE GENERATED PARTS, never from the
    // code under test: each case constructs (surface, normalized hgvs,
    // type, wt, mut) independently, embeds the surface in pattern-free
    // filler, and asserts the recognizer returns exactly that mention
    val aa3 = MutationNer.AminoAcids3
    val aa1 = MutationNer.AminoAcids1
    val bases = "ACGT"
    val rnd = new scala.util.Random(20260817)
    def pos() = 1 + rnd.nextInt(9999)
    var checked = 0
    (0 until 500).foreach { i =>
      val kind = i % 10
      val ai = rnd.nextInt(20); val bi = (ai + 1 + rnd.nextInt(19)) % 20
      val p1 = pos(); val p2 = p1 + 1 + rnd.nextInt(50)
      val b1 = bases(rnd.nextInt(4)); val b2l = bases.filterNot(_ == b1)
      val b2 = b2l(rnd.nextInt(b2l.length))
      val nucPrefix = "cgmnr".charAt(rnd.nextInt(5))
      // (surface, hgvs, type, wt, mut, isProtein)
      val (surface, hgvs, tpe, wt, mut, isProt) = kind match {
        case 0 => (s"$nucPrefix.$p1$b1>$b2", s"$nucPrefix.$p1$b1>$b2",
          "SUBSTITUTION", s"$b1", s"$b2", false)
        case 1 => (s"$nucPrefix.${p1}del$b1", s"$nucPrefix.${p1}del$b1",
          "DELETION", s"$b1", "", false)
        case 2 => (s"$nucPrefix.${p1}_${p2}ins$b1$b2", s"$nucPrefix.${p1}_${p2}ins$b1$b2",
          "INSERTION", "", s"$b1$b2", false)
        case 3 => (s"$nucPrefix.${p1}dup$b2", s"$nucPrefix.${p1}dup$b2",
          "DUPLICATION", s"$b2", "", false)
        case 4 => (s"$nucPrefix.${p1}_${p2}delins$b2$b1", s"$nucPrefix.${p1}_${p2}delins$b2$b1",
          "DELETION_INSERTION", "", s"$b2$b1", false)
        case 5 => (s"p.${aa3(ai)}$p1${aa3(bi)}", s"p.${aa3(ai)}$p1${aa3(bi)}",
          "SUBSTITUTION", aa1(ai), aa1(bi), true)
        case 6 => (s"p.${aa1(ai)}$p1${aa1(bi)}", s"p.${aa3(ai)}$p1${aa3(bi)}",
          "SUBSTITUTION", aa1(ai), aa1(bi), true)
        case 7 => (s"p.${aa3(ai)}${p1}del", s"p.${aa3(ai)}${p1}del",
          "DELETION", aa1(ai), "", true)
        case 8 =>
          val term = 1 + rnd.nextInt(99)
          (s"p.${aa3(ai)}$p1${aa3(bi)}fsTer$term", s"p.${aa3(ai)}$p1${aa3(bi)}fsTer$term",
            "FRAMESHIFT", aa1(ai), aa1(bi), true)
        case _ => (s"p.${aa3(ai)}${p1}_${aa3(bi)}${p2}dup",
          s"p.${aa3(ai)}${p1}_${aa3(bi)}${p2}dup", "DUPLICATION", aa1(ai), "", true)
      }
      // pattern-free filler (lowercase words, no digits or dots), optional
      // literature parens around the mention
      val wrapped = if (rnd.nextBoolean()) s"($surface)" else surface
      val text = s"the sample carried $wrapped in this gene"
      val found = MutationNer.findMutations(text).filter(_.foundWith == "SETH")
      assert(found.size == 1, s"case $i: $text -> $found")
      val f = found.head
      assert(f.text == surface, s"case $i: got '${f.text}' want '$surface'")
      assert(text.substring(f.start, f.end) == surface, s"case $i span")
      assert(f.hgvs == hgvs, s"case $i: hgvs '${f.hgvs}' want '$hgvs'")
      assert(f.mutationType == tpe, s"case $i type")
      assert(f.wtResidue == wt && f.mutResidue == mut, s"case $i residues")
      assert(f.proteinMutation == isProt && f.nucleotideMutation == !isProt)
      checked += 1
    }
    assert(checked == 500)
  }
}
