package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.OpsinNer.MiniIupacResolver

/** Seeded generator fuzz for the IUPAC mini-grammar resolver (the same
  * derived-expectation technique as the round-6 mutation-grammar fuzz):
  * names are GENERATED from structure parameters, so every expectation is
  * derived from the parameters independently of the resolver's lexer —
  * including the lexing hazards ("pentane" must not lex as p|ethane,
  * "nonane" not as non|ane+garbage), mirror-locant canonicalization,
  * case-insensitivity, and the reject surface (bad locants, tiny rings,
  * unknown stems, unknown suffixes).
  */
class OpsinFuzzSpec extends AnyFunSuite {

  private val stems = Vector("meth" -> 1, "eth" -> 2, "prop" -> 3, "but" -> 4,
    "pent" -> 5, "hex" -> 6, "hept" -> 7, "oct" -> 8, "non" -> 9, "dec" -> 10)

  /** Parse a resolver SMILES back into structure parameters by scanning —
    * an independent decoder, not the resolver's builder. */
  private def decode(smiles: String): (Int, Boolean, Int, String) = {
    val ring = smiles.contains("C1")
    var carbons = 0; var branchAt = 0; var atom = ""
    var i = 0
    while (i < smiles.length) {
      smiles.charAt(i) match {
        case 'C' => carbons += 1; i += 1
        case '1' => i += 1
        case '(' =>
          branchAt = carbons
          atom = smiles.charAt(i + 1).toString
          i += 3 // "(X)"
        case c => fail(s"unexpected char $c in $smiles")
      }
    }
    (carbons, ring, branchAt, atom)
  }

  private def shuffleCase(s: String, r: scala.util.Random): String =
    s.map(c => if (r.nextBoolean()) c.toUpper else c.toLower)

  test("500 seeded grammar samples: accept surface decodes to the generating " +
    "parameters; mirror and case invariances hold") {
    val r = new scala.util.Random(0x09151)
    var accepted = 0
    for (_ <- 1 to 500) {
      val (stem, n) = stems(r.nextInt(stems.length))
      val ring = r.nextBoolean()
      val kind = r.nextInt(3) // 0=ane, 1=ol, 2=amine
      val locant = 1 + r.nextInt(n) // valid range
      val name0 =
        if (kind == 0) s"${if (ring) "cyclo" else ""}${stem}ane"
        else s"${if (ring) "cyclo" else ""}${stem}an-$locant-${if (kind == 1) "ol" else "amine"}"
      val name = shuffleCase(name0, r)
      val res = MiniIupacResolver.nameToStructure(name)
      if (ring && n < 3) {
        assert(res.isLeft, s"$name: a $n-carbon ring must not form")
      } else {
        accepted += 1
        val smiles = res.fold(e => fail(s"$name unexpectedly rejected: $e"), identity)
        val (cGot, ringGot, pGot, atomGot) = decode(smiles)
        assert(cGot == n, s"$name: carbon count")
        assert(ringGot == ring, s"$name: ring flag")
        if (kind == 0) assert(pGot == 0 && atomGot == "", s"$name: unexpected branch")
        else {
          val expectAtom = if (kind == 1) "O" else "N"
          val expectP = if (ring) 1 else math.min(locant, n + 1 - locant)
          assert(pGot == expectP && atomGot == expectAtom,
            s"$name: branch ($pGot,$atomGot) != ($expectP,$expectAtom)")
          // mirror invariance: the chain-reflected locant resolves identically
          if (!ring) {
            val mirror = s"${stem}an-${n + 1 - locant}-${if (kind == 1) "ol" else "amine"}"
            assert(MiniIupacResolver.nameToStructure(mirror) == Right(smiles),
              s"$name vs $mirror")
          }
        }
        // case invariance
        assert(MiniIupacResolver.nameToStructure(name0.toUpperCase) == Right(smiles), name0)
      }
    }
    assert(accepted > 400, s"generator degenerate: only $accepted accepted")
  }

  test("reject surface: bad locants, tiny rings, unknown stems/suffixes, " +
    "lexing near-misses") {
    val rejects = Seq(
      "propan-0-ol", "propan-4-ol", "butan-5-amine", // locant out of range
      "cyclomethane", "cycloethane", // <3-carbon rings
      "undecane", "icosane", "xyzane", // unknown stems
      "propan-1-thiol", "propanol", "propan--1-ol", // unknown/garbled suffixes
      "pentan", "ethan", // bare stem without a suffix
      "methaneX", " propane", // trailing/leading junk (anchored match)
      "1,4:3,6-dianhydro-2,5-di-O-Nitro-D-glucitol") // the reference's own example
    rejects.foreach(nm =>
      assert(MiniIupacResolver.nameToStructure(nm).isLeft, nm))
    // lexing hazards that MUST accept with the right stem
    assert(MiniIupacResolver.nameToStructure("pentane") == Right("CCCCC"))
    assert(MiniIupacResolver.nameToStructure("nonane") == Right("CCCCCCCCC"))
    assert(MiniIupacResolver.nameToStructure("methane") == Right("C"))
    assert(MiniIupacResolver.nameToStructure("ethane") == Right("CC"))
  }
}
