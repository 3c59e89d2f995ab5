package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.ner.EntitySplitter
import graft.text.Normalizer

/** Seeded fuzz for the C4 numerical-list splitter: mentions are GENERATED
  * from (prefix, digit-part, junk-part) parameters, and the expected
  * non-contiguous mentions are re-derived with a closed-form rule
  * (trailing-digit count → prefix cut; offsets advance over digit parts
  * only) independent of the implementation's reversed-enumerate loop —
  * including the reference's all-digits quirk (prefix = first char).
  */
class NumericalListFuzzSpec extends AnyFunSuite {

  private def mention(text: String, start: Int, len: Int): Mention = {
    val m = text.substring(start, start + len)
    Mention(m, "gene", Seq(CharSpan(start, start + len)), "t", 50,
      Normalizer.normalize(m, "gene"))
  }

  test("600 seeded draws: split output equals the closed-form expectation") {
    val r = new scala.util.Random(0xc4c4)
    for (draw <- 1 to 600) {
      val letters = (1 to r.nextInt(5)).map(_ => ('A' + r.nextInt(26)).toChar).mkString
      val trailing = (1 to r.nextInt(4)).map(_ => ('0' + r.nextInt(10)).toChar).mkString
      val p0 = letters + trailing
      val nParts = r.nextInt(4)
      val tail = (1 to nParts).map { _ =>
        if (r.nextInt(4) == 0) "x" + r.nextInt(10) // junk part (non-digit)
        else (1 + r.nextInt(999)).toString
      }
      val matchStr = (p0 +: tail).mkString("/")
      if (matchStr.nonEmpty) {
        val pad = "zz " * r.nextInt(3)
        val text = pad + matchStr + " tail"
        val e = mention(text, pad.length, matchStr.length)
        val got = EntitySplitter.splitNumericalList(e, text)

        // ---- closed-form expectation --------------------------------------
        val parts = matchStr.split("/", -1)
        val expected =
          if (parts.length <= 1) Seq.empty[Seq[(Int, Int)]]
          else {
            val start = pad.length
            val first = Seq(Seq((start, start + p0.length)))
            val t = p0.reverseIterator.takeWhile(_.isDigit).size
            val iRef =
              if (p0.isEmpty) 0
              else if (t == p0.length) p0.length - 1 // all-digits quirk
              else t
            if (iRef == 0) first
            else {
              val prefixLen = p0.length - iRef
              var off = p0.length + 1
              first ++ parts.tail.flatMap { part =>
                if (part.nonEmpty && part.forall(_.isDigit)) {
                  val spans = Seq((start, start + prefixLen),
                    (start + off, start + off + part.length))
                  off += 1 + part.length
                  Some(spans)
                } else None
              }
            }
          }
        assert(got.map(_.spans.map(s => (s.start, s.end))) == expected,
          s"draw $draw matchStr='$matchStr'")
        // span/text coherence: every produced matchStr is the concatenation
        // of its spans' substrings
        got.foreach { m =>
          assert(m.matchStr ==
            m.spans.map(s => text.substring(s.start, s.end)).mkString(""))
        }
      }
    }
  }
}
