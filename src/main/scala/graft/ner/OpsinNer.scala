package graft.ner

import graft.model._
import graft.text.Normalizer

/** OPSIN chemistry-resolution step plane — the IUPAC half of SURVEY.md §2.C9
  * (ref kazu/steps/ner/opsin.py:25-381 + kazu-jvm OpsinRunner.scala:6-18).
  *
  * The reference's transformer NER often emits IUPAC chemical nomenclature
  * as `drug` entities that no dictionary can link (no synonym exists for an
  * arbitrary systematic name). OpsinStep repairs both problems at once:
  *
  *  1. **Boundary repair** (opsin.py extendString:303-337): transformer
  *     matches truncate at the first hyphen; the step re-extends the span —
  *     left to the previous IUPAC break char, right through up to `spaces`
  *     break chars — and tries the candidates LONGEST-FIRST.
  *  2. **Linking** (opsin.py parseString:339-381): the first candidate the
  *     IUPAC parser resolves becomes the entity's single Mapping with the
  *     canonical SMILES as `idx`, source/parser "Opsin", HIGHLY_LIKELY
  *     confidence; the original entity is REPLACED (match, span and
  *     match_norm recomputed — the reference's dataclasses.replace re-runs
  *     __post_init__, kazu/data/__init__.py:322-324).
  *
  * Entities are eligible only when they carry the configured entity class
  * AND zero mappings (opsin.py:296-300); an optional document condition
  * (the reference's EntityClassFilter, kazu/utils/utils.py:126-140) skips
  * documents with no entity of a required class, because parsing is the
  * expensive part.
  *
  * The OPSIN fatjar itself is environment-blocked (zero egress, external
  * chemistry jar), so the parser sits behind the pluggable [[IupacResolver]]
  * slot — exactly how the C6/C7 model planes are built. [[MiniIupacResolver]]
  * is a first-party stand-in that GENUINELY derives SMILES for a closed
  * mini-grammar of alkanes/alcohols/amines (acyclic + cyclo), including the
  * mirror-locant canonicalization the reference gets from RDKit's
  * CanonSmiles; everything outside the grammar fails to parse, which is the
  * reference's unparseable-name path (its own doc example:
  * "1,4:3,6-dianhydro-2,5-di-O-Nitro-D-glucitol" → no Mapping).
  *
  * Scale shape: one narrow mapPartitions over the doc stream — the resolver
  * is executor-pinned, per-document work is bounded by entity count ×
  * candidate count, nothing shuffles.
  */
object OpsinNer {

  val Namespace = "OpsinStep"

  /** IUPAC break characters (opsin.py:20, citing the ACD IUPAC
    * recommendations R-9.3: the chars a systematic name never contains). */
  val Breaks: Set[Char] = " !@#&?|\t\n\r".toSet

  /** The parser slot (ref OpsinRunner.nameToStructure, which throws with
    * the parse-failure message — modeled as Left). */
  trait IupacResolver extends Serializable {
    def nameToStructure(name: String): Either[String, String]
  }

  /** First-party resolver over a closed IUPAC mini-grammar:
    * `(cyclo)?STEMane`, `(cyclo)?STEMan-<p>-ol`, `(cyclo)?STEMan-<p>-amine`
    * for the C1..C10 stems, case-insensitive (OPSIN accepts capitalized
    * names). SMILES normal form: a "C" chain with the heteroatom as a
    * parenthesized branch on the substituted carbon — e.g. propan-1-ol →
    * "C(O)CC" — with the locant mirrored to the chain-symmetric minimum
    * (butan-3-amine ≡ butan-2-amine → "CC(N)CC"), which is the
    * canonicalization role RDKit's CanonSmiles plays in the reference
    * (rdkit is env-blocked; this normal form is injective on the grammar,
    * documented as a divergence in surface form only). */
  object MiniIupacResolver extends IupacResolver {
    private val stems = Seq("meth" -> 1, "eth" -> 2, "prop" -> 3, "but" -> 4,
      "pent" -> 5, "hex" -> 6, "hept" -> 7, "oct" -> 8, "non" -> 9, "dec" -> 10)
    private val stemLen = stems.map { case (s, n) => s.toLowerCase -> n }.toMap
    // longest-stem-first alternation so "pent" never lexes as "p|ent";
    // "non" before... order within the alternation is by declaration, and
    // "meth|eth" must try "meth" first
    private val Name =
      ("(?i)^(cyclo)?(" + stems.map(_._1).sortBy(-_.length).mkString("|") +
        ")(?:ane|an-([0-9]+)-(ol|amine))$").r

    def nameToStructure(name: String): Either[String, String] = name match {
      case Name(cyclo, stem, locant, subst) =>
        val n = stemLen(stem.toLowerCase(java.util.Locale.ROOT))
        val ring = cyclo != null
        if (ring && n < 3) Left(s"cannot form a $n-carbon ring")
        else if (locant == null) Right(smiles(n, ring, 0, ""))
        else {
          val p = try locant.toInt catch { case _: NumberFormatException => -1 }
          if (p < 1 || p > n) Left(s"locant $locant invalid for chain of $n")
          else {
            val atom = if (subst.toLowerCase(java.util.Locale.ROOT) == "ol") "O" else "N"
            // mirror-symmetric locant canonicalization; on a ring every
            // single-substituent position is equivalent → position 1
            val pc = if (ring) 1 else math.min(p, n + 1 - p)
            Right(smiles(n, ring, pc, atom))
          }
        }
      case _ => Left(s"unparseable name: $name")
    }

    private def smiles(n: Int, ring: Boolean, p: Int, atom: String): String = {
      val chain = (1 to n).map { i =>
        val c = if (ring && i == 1) "C1" else "C"
        if (i == p) c + "(" + atom + ")" else c
      }.mkString
      if (ring) chain + "1" else chain
    }
  }

  final case class Config(
      entityClass: String = "drug",
      /** max break chars to extend through on the right (opsin.py:297). */
      spaces: Int = 2,
      /** the reference's EntityClassFilter condition: None = no condition. */
      requiredEntityClasses: Option[Set[String]] = None)

  /** Exact port of OpsinStep.extendString (opsin.py:303-337): extend left
    * to the previous break, extend right recording a candidate at each
    * break consumed while `spaces` remain, stop at the first break beyond
    * the budget (or section end), then add the full extension unless it
    * duplicates the last recorded candidate. Yields longest-first. */
  def extendString(entStart: Int, entEnd: Int, section: String,
      spaces: Int): Seq[(String, Int, Int)] = {
    var start = entStart
    var end = entEnd
    var sp = spaces
    val res = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    while (start > 0 && !Breaks(section.charAt(start - 1))) start -= 1
    while (end < section.length && (!Breaks(section.charAt(end)) || sp > 0)) {
      if (Breaks(section.charAt(end))) {
        sp -= 1
        res += ((section.substring(start, end), start, end))
      }
      end += 1
    }
    val last = (section.substring(start, end), start, end)
    if (res.isEmpty || res.last != last) res += last
    res.reverse.toSeq
  }

  /** One document through the step (opsin.py __call__:283-301): per
    * section, each eligible entity (configured class, zero mappings) is
    * replaced by the first extension candidate the resolver parses; the
    * original is removed and the replacement APPENDED (the reference
    * removes then appends, so repaired entities land at the end of the
    * section's entity list). */
  def processDoc(cfg: Config, resolver: IupacResolver)(doc: KDoc): KDoc = {
    val condOk = cfg.requiredEntityClasses.forall(req =>
      doc.entities.exists(e => req(e.entityClass)))
    if (!condOk) return doc
    val sections = doc.sections.map { sec =>
      var replacedAny = false
      // keyed by POSITION, not value: the reference keys its replacement
      // dict on Entity object identity, so two value-equal mentions (same
      // span from two NER sources) are each processed and each replaced —
      // value keying would remove both originals but append only one
      val replaced = scala.collection.mutable.LinkedHashMap.empty[Int, Mention]
      sec.entities.zipWithIndex.foreach { case (ent, entIdx) =>
        if (ent.entityClass == cfg.entityClass && ent.mappings.isEmpty) {
          val it = extendString(ent.start, ent.end, sec.text, cfg.spaces).iterator
          var done = false
          while (!done && it.hasNext) {
            val (cand, s, e) = it.next()
            resolver.nameToStructure(cand) match {
              case Right(sm) =>
                replaced(entIdx) = ent.copy(
                  matchStr = cand,
                  spans = Seq(CharSpan(s, e)),
                  matchNorm = Normalizer.normalize(cand, ent.entityClass),
                  mappings = Seq(Mapping(
                    defaultLabel = cand,
                    source = "Opsin",
                    parserName = "Opsin",
                    idx = sm,
                    stringMatchStrategy = Namespace,
                    stringMatchConfidence = StringMatchConfidence.HighlyLikely,
                    disambiguationStrategy = None,
                    disambiguationConfidence = None)))
                replacedAny = true
                done = true
              case Left(_) => () // try the next (shorter) candidate
            }
          }
        }
      }
      if (!replacedAny) sec
      else sec.copy(entities =
        sec.entities.zipWithIndex.collect {
          case (ent, i) if !replaced.contains(i) => ent
        } ++ replaced.values)
    }
    doc.copy(sections = sections)
  }

  /** Dataset plane: one narrow mapPartitions, resolver instantiated once
    * per partition (executor-pinned — the reference launches one py4j
    * gateway per worker process). */
  def annotate(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.Dataset[KDoc],
      resolverFactory: () => IupacResolver,
      cfg: Config = Config()
  ): org.apache.spark.sql.Dataset[KDoc] = {
    import spark.implicits._
    docs.mapPartitions { it =>
      val resolver = resolverFactory()
      it.map(processDoc(cfg, resolver))
    }
  }
}
