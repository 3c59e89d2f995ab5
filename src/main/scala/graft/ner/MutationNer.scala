package graft.ner

import graft.model.{CharSpan, Mapping, Mention}

/** C9 — mutation NER (SETH: SNP Extraction Tool for Human Variations).
  *
  * The reference wraps the published SETH tool over py4j
  * (kazu/steps/ner/seth.py:20-178; kazu-jvm SethRunner.scala:9-35) and the
  * jar is env-blocked here, so this is a FIRST-PARTY re-implementation of
  * the published, deterministic part of the algorithm — the
  * mutation-nomenclature grammar of Thomas et al. 2016 (SETH detects and
  * normalizes genetic variants in text, Bioinformatics) built on the HGVS
  * nomenclature (den Dunnen et al., Hum Mutat 2016) plus the
  * MutationFinder surface patterns (Caporaso et al. 2007) and dbSNP rs
  * identifiers — the same three recognition planes SETH combines
  * (`found_with` mirrors MutationMention.getTool). The ML-free grammar is
  * the whole default behavior; no trained assets are involved (the
  * rapidfuzz/BPE porting playbook).
  *
  * Recognized (grammar plane, `SETH`):
  *  - nucleotide HGVS on prefixes c./g./m./n./r. — substitution
  *    (c.269T>C), deletion (c.35delG, c.76_78del), duplication (c.35dupG),
  *    insertion (c.76_77insT), deletion-insertion (c.112_117delinsTG),
  *    inversion (c.203_506inv); positions may carry UTR/intronic markers
  *    (c.-12A>T, c.88+2T>G, c.*46del).
  *  - protein HGVS on p. — substitution in one- or three-letter code with
  *    optional parentheses (p.Leu90Pro, p.L90P, p.(Trp26Ter), p.*90Leu),
  *    point/range deletion and duplication (p.Leu90del,
  *    p.Ala3_Ser5dup), insertion/delins (p.Lys2_Gly3insGlnSer),
  *    frameshift (p.Arg97fs, p.Arg97ProfsTer23).
  *
  * Free-text plane (`MUTATIONFINDER`): wNm one-letter substitutions (L90P
  * — flagged `ambiguous`, the one-letter form collides with cell-line and
  * chromosome-band names) and three-letter Xaa123Yaa forms (Leu90Pro).
  * Identifier plane (`DBSNP`): rs123456.
  *
  * Normalization (`hgvs`, mirroring MutationMention.toHGVS): grammar
  * matches are already HGVS and normalize to themselves minus parentheses;
  * protein residues normalize to THREE-letter names (official HGVS style;
  * pinned by the reference's own executable evidence — test_seth.py:11
  * expects `p.Leu90Pro` for the free-text input "L90P" — so `L90P`,
  * `p.L90P` and `p.Leu90Pro` all share one normalized key), stop codons to
  * `Ter`; free-text substitutions normalize to `p.<Wt><pos><Mut>`; rs ids
  * to `rs<n>`. The `wtResidue`/`mutResidue` FIELDS stay one-letter (compact
  * internal convention; the normalized key is `hgvs`).
  *
  * Overlap resolution: all planes propose candidates; longest match wins,
  * ties to the earlier plane (SETH > MutationFinder > dbSNP) — so `L90P
  * (c.269T>C)` yields exactly two mentions and the free-text reading of a
  * `p.`-prefixed residue never double-fires.
  */
object MutationNer {

  final case class MutationMention(
      start: Int, end: Int, text: String, hgvs: String,
      wtResidue: String, mutResidue: String, mutationType: String,
      foundWith: String, proteinMutation: Boolean,
      nucleotideMutation: Boolean, ambiguous: Boolean)

  // --- vocabulary ----------------------------------------------------------

  private val Aa3Names = Seq(
    "Ala", "Arg", "Asn", "Asp", "Cys", "Gln", "Glu", "Gly", "His", "Ile",
    "Leu", "Lys", "Met", "Phe", "Pro", "Ser", "Thr", "Trp", "Tyr", "Val")
  private val Aa3To1: Map[String, String] = Map(
    "Ala" -> "A", "Arg" -> "R", "Asn" -> "N", "Asp" -> "D", "Cys" -> "C",
    "Gln" -> "Q", "Glu" -> "E", "Gly" -> "G", "His" -> "H", "Ile" -> "I",
    "Leu" -> "L", "Lys" -> "K", "Met" -> "M", "Phe" -> "F", "Pro" -> "P",
    "Ser" -> "S", "Thr" -> "T", "Trp" -> "W", "Tyr" -> "Y", "Val" -> "V",
    "Ter" -> "*")
  private val Aa1 = "ARNDCQEGHILKMFPSTWYV"

  /** Public fixture tables (the kg_mutations driver row and its oracle
    * derive planted mentions from the SAME ordered lists). */
  val AminoAcids3: Seq[String] = Aa3Names
  val AminoAcids1: Seq[String] = Aa3Names.map(Aa3To1)

  /** Normalize an amino-acid token (3-letter name, 1-letter code, Ter, *)
    * to its one-letter code. */
  private[ner] def to1(aa: String): String =
    if (aa == null || aa.isEmpty) ""
    else if (aa == "*") "*"
    else Aa3To1.getOrElse(aa, aa)

  /** Normalize a residue SEQUENCE (mixed 3-letter names / 1-letter codes /
    * Ter) to one-letter codes, greedy 3-letter-first. */
  private[ner] def seqTo1(seq: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < seq.length) {
      val tri = if (i + 3 <= seq.length) seq.substring(i, i + 3) else ""
      Aa3To1.get(tri) match {
        case Some(one) => sb.append(one); i += 3
        case None      => sb.append(seq.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  private val Aa1To3: Map[String, String] =
    Aa3To1.map(_.swap) // includes "*" -> "Ter"

  /** Render an amino-acid token (3-letter name, 1-letter code, Ter, *) as
    * its THREE-letter name for the normalized HGVS string. */
  private[ner] def to3(aa: String): String =
    if (aa == null || aa.isEmpty) ""
    else if (Aa3To1.contains(aa)) aa // already a canonical 3-letter name/Ter
    else Aa1To3.getOrElse(aa, aa)

  /** Render a residue SEQUENCE as concatenated three-letter names. */
  private[ner] def seqTo3(seq: String): String =
    seqTo1(seq).map(c => Aa1To3.getOrElse(c.toString, c.toString)).mkString

  // --- patterns ------------------------------------------------------------

  private val G = """(?<![A-Za-z0-9.])""" // left boundary (also blocks x.y chains)
  private val E = """(?![A-Za-z0-9])"""   // right boundary
  private val B = "[ACGTU]"
  private val Pos = """[*-]?\d+(?:[+-]\d+)?"""
  private val Aa = "(?:" + Aa3Names.mkString("|") + "|Ter|[" + Aa1 + """*])"""

  private val NucRe =
    (G + """([cgmnr])\.(""" + Pos + """)(?:_(""" + Pos + """))?""" +
      """(?:(""" + B + """)>(""" + B + """)""" +
      """|delins(""" + B + """+)""" +
      """|del(""" + B + """*)""" +
      """|dup(""" + B + """*)""" +
      """|ins(""" + B + """+)""" +
      """|(inv))""" + E).r.pattern

  private val ProtFsRe =
    (G + """p\.(\(?)(""" + Aa + """)(\d+)(""" + Aa + """)?fs(?:(?:\*|Ter)(\d+))?(\)?)""" + E).r.pattern
  private val ProtRangeRe =
    (G + """p\.(\(?)(""" + Aa + """)(\d+)_(""" + Aa + """)(\d+)(?:delins((?:""" + Aa + """)+)|ins((?:""" + Aa + """)+)|(del)|(dup))(\)?)""" + E).r.pattern
  private val ProtPointRe =
    (G + """p\.(\(?)(""" + Aa + """)(\d+)(del|dup)(\)?)""" + E).r.pattern
  private val ProtSubRe =
    (G + """p\.(\(?)(""" + Aa + """)(\d+)(""" + Aa + """|=)(\)?)""" + E).r.pattern

  private val Mf1Re =
    (G + """([""" + Aa1 + """])(\d+)([""" + Aa1 + """])""" + E).r.pattern
  private val Mf3Re =
    (G + "(" + Aa3Names.mkString("|") + """)(\d+)(""" + Aa3Names.mkString("|") + """|Ter)""" + E).r.pattern
  private val RsRe = (G + """rs(\d+)""" + E).r.pattern

  // --- recognition ---------------------------------------------------------

  private final case class Cand(priority: Int, m: MutationMention)

  def findMutations(text: String): Seq[MutationMention] = {
    val cands = scala.collection.mutable.ArrayBuffer.empty[Cand]

    val nm = NucRe.matcher(text)
    while (nm.find()) {
      val (tpe, wt, mut) =
        if (nm.group(4) != null) ("SUBSTITUTION", nm.group(4), nm.group(5))
        else if (nm.group(6) != null) ("DELETION_INSERTION", "", nm.group(6))
        else if (nm.group(7) != null) ("DELETION", nm.group(7), "")
        else if (nm.group(8) != null) ("DUPLICATION", nm.group(8), "")
        else if (nm.group(9) != null) ("INSERTION", "", nm.group(9))
        else ("INVERSION", "", "")
      // every prefix (c/g/m/n/r) reports as a nucleotide-level variant
      cands += Cand(0, MutationMention(nm.start, nm.end, nm.group(),
        hgvs = nm.group(), wtResidue = wt, mutResidue = mut,
        mutationType = tpe, foundWith = "SETH",
        proteinMutation = false, nucleotideMutation = true,
        ambiguous = false))
    }

    // Paren handling for the protein planes: HGVS uncertain syntax
    // `p.(Leu90Pro)` keeps both parens; the common literature form
    // `... (p.Leu90Pro) ...` has the OPEN paren before `p.` (outside the
    // match) while the sentence's close paren lands in the optional close
    // group — the mention is real, the paren is not part of it, so trim it
    // from the span instead of rejecting the match. An open without a close
    // (`p.(Leu90Pro`) is genuinely malformed and stays rejected.
    def span(open: String, close: String, start: Int, end: Int,
        matched: String): Option[(Int, Int, String)] =
      if ((open == "(") == (close == ")")) Some((start, end, matched))
      else if (open.isEmpty && close == ")") Some((start, end - 1, matched.dropRight(1)))
      else None

    val fm = ProtFsRe.matcher(text)
    while (fm.find()) span(fm.group(1), fm.group(6), fm.start, fm.end,
        fm.group()).foreach { case (ms, me, mt) =>
      val wt = to1(fm.group(2))
      val mut = to1(fm.group(4))
      val term = Option(fm.group(5)).map("Ter" + _).getOrElse("")
      cands += Cand(0, MutationMention(ms, me, mt,
        // the normalized form keeps the NEW residue when stated
        // (p.R97Pfs*23 → p.Arg97ProfsTer23): dropping it would collapse
        // distinct frameshift variants to one normalized key
        hgvs = "p." + to3(fm.group(2)) + fm.group(3) + to3(fm.group(4)) + "fs" + term,
        wtResidue = wt, mutResidue = mut, mutationType = "FRAMESHIFT",
        foundWith = "SETH", proteinMutation = true,
        nucleotideMutation = false, ambiguous = false))
    }

    val rm = ProtRangeRe.matcher(text)
    while (rm.find()) span(rm.group(1), rm.group(10), rm.start, rm.end,
        rm.group()).foreach { case (ms, me, mt) =>
      val (tpe, op, seq) =
        if (rm.group(6) != null) ("DELETION_INSERTION", "delins", seqTo3(rm.group(6)))
        else if (rm.group(7) != null) ("INSERTION", "ins", seqTo3(rm.group(7)))
        else if (rm.group(8) != null) ("DELETION", "del", "")
        else ("DUPLICATION", "dup", "")
      val wt = to1(rm.group(2))
      cands += Cand(0, MutationMention(ms, me, mt,
        hgvs = "p." + to3(rm.group(2)) + rm.group(3) + "_" + to3(rm.group(4)) + rm.group(5) + op + seq,
        wtResidue = wt, mutResidue = seqTo1(seq), mutationType = tpe,
        foundWith = "SETH", proteinMutation = true,
        nucleotideMutation = false, ambiguous = false))
    }

    val pm = ProtPointRe.matcher(text)
    while (pm.find()) span(pm.group(1), pm.group(5), pm.start, pm.end,
        pm.group()).foreach { case (ms, me, mt) =>
      val wt = to1(pm.group(2))
      val tpe = if (pm.group(4) == "del") "DELETION" else "DUPLICATION"
      cands += Cand(0, MutationMention(ms, me, mt,
        hgvs = "p." + to3(pm.group(2)) + pm.group(3) + pm.group(4),
        wtResidue = wt, mutResidue = "", mutationType = tpe,
        foundWith = "SETH", proteinMutation = true,
        nucleotideMutation = false, ambiguous = false))
    }

    val sm = ProtSubRe.matcher(text)
    while (sm.find()) span(sm.group(1), sm.group(5), sm.start, sm.end,
        sm.group()).foreach { case (ms, me, mt) =>
      val wt = to1(sm.group(2))
      val mutTok = sm.group(4)
      val mut = if (mutTok == "=") wt else to1(mutTok)
      val tpe = if (mutTok == "=" || mut == wt) "SILENT" else "SUBSTITUTION"
      cands += Cand(0, MutationMention(ms, me, mt,
        hgvs = "p." + to3(sm.group(2)) + sm.group(3) + (if (mutTok == "=") "=" else to3(mutTok)),
        wtResidue = wt, mutResidue = mut, mutationType = tpe,
        foundWith = "SETH", proteinMutation = true,
        nucleotideMutation = false, ambiguous = false))
    }

    val m1 = Mf1Re.matcher(text)
    while (m1.find()) if (m1.group(1) != m1.group(3)) {
      cands += Cand(1, MutationMention(m1.start, m1.end, m1.group(),
        hgvs = "p." + to3(m1.group(1)) + m1.group(2) + to3(m1.group(3)),
        wtResidue = m1.group(1), mutResidue = m1.group(3),
        mutationType = "SUBSTITUTION", foundWith = "MUTATIONFINDER",
        proteinMutation = true, nucleotideMutation = false,
        ambiguous = true))
    }

    val m3 = Mf3Re.matcher(text)
    while (m3.find()) if (to1(m3.group(1)) != to1(m3.group(3))) {
      cands += Cand(1, MutationMention(m3.start, m3.end, m3.group(),
        hgvs = "p." + m3.group(1) + m3.group(2) + m3.group(3),
        wtResidue = to1(m3.group(1)), mutResidue = to1(m3.group(3)),
        mutationType = "SUBSTITUTION", foundWith = "MUTATIONFINDER",
        proteinMutation = true, nucleotideMutation = false,
        ambiguous = false))
    }

    val rs = RsRe.matcher(text)
    while (rs.find()) {
      cands += Cand(2, MutationMention(rs.start, rs.end, rs.group(),
        hgvs = "rs" + rs.group(1), wtResidue = "", mutResidue = "",
        mutationType = "DBSNP", foundWith = "DBSNP",
        proteinMutation = false, nucleotideMutation = false,
        ambiguous = false))
    }

    // longest-match-wins, ties to the earlier plane, then left-to-right
    val sorted = cands.sortBy(c => (c.m.start, -(c.m.end - c.m.start), c.priority))
    val out = scala.collection.mutable.ArrayBuffer.empty[MutationMention]
    var lastEnd = -1
    sorted.foreach { c =>
      if (c.m.start >= lastEnd) { out += c.m; lastEnd = c.m.end }
    }
    out.toSeq
  }

  // --- pipeline adapter ----------------------------------------------------

  val Namespace = "MutationNer"

  /** The SethStep entity shape (seth.py:107-133): every mention carries one
    * PROBABLE mapping whose label/source/idx are all the configured entity
    * class, and the full mutation record rides as metadata (here: in
    * matchNorm we keep the normalized HGVS — the pipeline's normalized-form
    * slot — since the reference stores it in entity metadata). */
  def mentions(text: String, entityClass: String = "mutation"): Seq[Mention] =
    findMutations(text).map { mm =>
      Mention(
        matchStr = mm.text,
        entityClass = entityClass,
        spans = Seq(CharSpan(mm.start, mm.end)),
        namespace = Namespace,
        mentionConfidence = graft.model.MentionConfidence.Probable,
        matchNorm = mm.hgvs,
        mappings = Seq(Mapping(
          defaultLabel = entityClass,
          source = entityClass,
          parserName = "n/a",
          idx = entityClass,
          stringMatchStrategy = Namespace,
          stringMatchConfidence = "PROBABLE",
          disambiguationStrategy = None,
          disambiguationConfidence = None)))
    }

  /** Document-level step (ref SethStep.__call__, seth.py:100-133):
    * optionally gated by `condition` — SETH is slow, so the reference skips
    * documents lacking pre-existing entities of interest (seth.py:84-87); a
    * skipped doc passes through UNCHANGED (a skip, not a failure). Found
    * entities append to each section's entity list, as in the reference. */
  def processDoc(entityClass: String = "mutation",
      condition: Option[graft.model.KDoc => Boolean] = None)(
      doc: graft.model.KDoc): graft.model.KDoc =
    if (doc.error.isDefined || condition.exists(c => !c(doc))) doc
    else doc.copy(sections = doc.sections.map(s =>
      s.copy(entities = s.entities ++ mentions(s.text, entityClass))))

  /** The reference's canonical condition: the doc already carries an entity
    * of one of the required classes (test_seth.py:36-53 drives the step
    * with `condition.required_entities` and expects a doc without them to
    * be skipped). */
  def requiredEntitiesCondition(required: Set[String]): graft.model.KDoc => Boolean =
    doc => doc.sections.exists(_.entities.exists(e => required(e.entityClass)))
}
