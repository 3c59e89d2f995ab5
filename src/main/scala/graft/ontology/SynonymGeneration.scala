package graft.ontology

import graft.text.Normalizer

/** Synonym generation for the ontology build (ref
  * kazu/ontology_preprocessing/synonym_generation.py:43-436): pure
  * string → set[string] generators, composed combinatorially; generated
  * strings become `alternative_synonyms` on each resource (never overriding
  * an original surface form). In Spark terms each generator is a flatMap
  * over the synonym table, run once per resource version in the offline job.
  */
object SynonymGeneration {

  trait Generator extends Serializable {
    def name: String
    def generate(s: String): Set[String]
  }

  /** Expand bracketed expressions: "ABC (xyz)" → {"ABC", "xyz", "ABC xyz"};
    * mid-expression brackets removed (ref SeparatorExpansion :111-155). */
  object SeparatorExpansion extends Generator {
    val name = "SeparatorExpansion"
    private val endBrackets = "(.*)\\((.*)\\)$".r
    private val midBrackets = "(.*)\\(.*\\)(.*)".r
    private val excluded = Set("", "non-protein coding")
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      s.trim match {
        case endBrackets(before, inside)
            if !excluded.contains(inside.trim) && before.trim.nonEmpty =>
          out += before.trim
          out += inside.trim
          out += s"${before.trim} ${inside.trim}"
        case midBrackets(before, after) if before.trim.nonEmpty =>
          out += s"${before.trim} ${after.trim}".trim.replaceAll("\\s+", " ")
        case _ =>
      }
      // slash/comma separated alternates
      if (s.contains('/') && !s.contains('('))
        s.split('/').map(_.trim).filter(_.nonEmpty).foreach(out += _)
      out.toSet - s
    }
  }

  /** Remove leading/trailing stopwords (ref StopWordRemover :157-175). */
  final class StopWordRemover(stopwords: Set[String]) extends Generator {
    val name = "StopWordRemover"
    def generate(s: String): Set[String] = {
      val toks = s.split(" ").toSeq
      val trimmed = toks
        .dropWhile(t => stopwords(t.toLowerCase(java.util.Locale.ROOT)))
        .reverse
        .dropWhile(t => stopwords(t.toLowerCase(java.util.Locale.ROOT)))
        .reverse
      val res = trimmed.mkString(" ")
      if (res.nonEmpty && res != s) Set(res) else Set.empty
    }
  }
  object StopWordRemover {
    val default = new StopWordRemover(Set("the", "of", "a", "an", "type"))
  }

  /** Bidirectional greek-letter ↔ name substitution (ref StringReplacement
    * with GreekSymbolSubstitution :177-270). */
  object GreekSubstitution extends Generator {
    val name = "GreekSubstitution"
    private val charToName: Seq[(String, String)] =
      Normalizer.GreekSubs.map { case (c, n) => (c, n) }
    // one variant per greek char spelling a name ("beta" → Β, ϐ, β);
    // names only replace at non-letter boundaries ("eta" must not fire
    // inside "beta")
    private val nameToChars: Seq[(java.util.regex.Pattern, Seq[String])] =
      Normalizer.GreekSubs.groupBy(_._2).toSeq.sortBy(_._1).map { case (n, cs) =>
        (java.util.regex.Pattern.compile(
          s"(?<![\\p{L}])${java.util.regex.Pattern.quote(n)}(?![\\p{L}])"),
          cs.map(_._1).distinct)
      }
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      charToName.foreach { case (c, n) =>
        if (s.contains(c)) out += s.replace(c, n)
      }
      nameToChars.foreach { case (pat, chars) =>
        val m = pat.matcher(s)
        if (m.find())
          chars.foreach(c => out += m.replaceAll(
            java.util.regex.Matcher.quoteReplacement(c)))
      }
      out.toSet - s
    }
  }

  /** Interchange suffixes from a set: "anaemia" + {ia,ic,a} → anaemic, ...
    * (ref SuffixReplacement :272-301, incl. its documented non-longest-match
    * permissiveness). */
  final class SuffixReplacement(suffixes: Set[String]) extends Generator {
    val name = "SuffixReplacement"
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      suffixes.foreach { suffix =>
        if (s.endsWith(suffix)) {
          val stem = s.stripSuffix(suffix)
          suffixes.foreach { ns => if (ns != suffix) out += stem + ns }
        }
      }
      out.toSet - s
    }
  }
  object SuffixReplacement {
    val default = new SuffixReplacement(Set("ia", "ic", "a"))
  }

  /** Fixed spelling-variation map, both directions (ref
    * SpellingVariationReplacement :303-320). */
  final class SpellingVariation(variants: Map[String, String]) extends Generator {
    val name = "SpellingVariation"
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      variants.foreach { case (a, b) =>
        if (s.contains(a)) out += s.replace(a, b)
        if (s.contains(b)) out += s.replace(b, a)
      }
      out.toSet - s
    }
  }
  object SpellingVariation {
    val default = new SpellingVariation(Map(
      "haem" -> "hem", "aemia" -> "emia", "oestr" -> "estr", "our" -> "or"))
  }

  /** Hyphenate/dehyphenate leading n-grams: "non small" ↔ "non-small"
    * (ref NgramHyphenation :322-337). */
  object NgramHyphenation extends Generator {
    val name = "NgramHyphenation"
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      val toks = s.split(" ")
      if (toks.length >= 2) {
        out += (toks(0) + "-" + toks(1) +
          (if (toks.length > 2) " " + toks.drop(2).mkString(" ") else ""))
      }
      if (s.contains('-')) out += s.replace('-', ' ')
      out.toSet - s
    }
  }

  /** Replace tokens from equivalence lists (ref
    * TokenListReplacementGenerator :339-384). */
  final class TokenListReplacement(groups: Seq[Set[String]]) extends Generator {
    val name = "TokenListReplacement"
    def generate(s: String): Set[String] = {
      val toks = s.split(" ").toSeq
      val out = scala.collection.mutable.Set.empty[String]
      toks.zipWithIndex.foreach { case (t, i) =>
        groups.foreach { g =>
          if (g.contains(t))
            (g - t).foreach(alt => out += toks.updated(i, alt).mkString(" "))
        }
      }
      out.toSet - s
    }
  }

  val defaultGenerators: Seq[Generator] = Seq(
    SeparatorExpansion, StopWordRemover.default, GreekSubstitution,
    SpellingVariation.default, NgramHyphenation)

  /** Combinatorial application (ref CombinatorialSynonymGenerator :43-108):
    * every permutation of generators is chained over the evolving synonym
    * set; strings already present as original synonyms are never re-added.
    * Returns the ALTERNATIVE synonyms for one resource's original strings.
    */
  def combinatorial(
      originals: Set[String],
      allOriginalStrings: Set[String],
      generators: Seq[Generator] = defaultGenerators
  ): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    generators.permutations.foreach { perm =>
      var current = originals
      perm.foreach { g =>
        val generated = current.flatMap(g.generate)
          .filterNot(allOriginalStrings.contains)
        out ++= generated
        current = current ++ generated
      }
    }
    out.toSet -- originals
  }
}
