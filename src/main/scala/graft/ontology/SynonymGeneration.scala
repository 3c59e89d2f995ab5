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

  /** Expand bracketed expressions (ref SeparatorExpansion :111-155):
    * end-expression brackets split into (before, inside, rejoined), with
    * groups that are excluded or pure stopwords dropped; mid-expression
    * brackets are removed; slash- and comma-separated alternates expand —
    * over the paren-derived groups ONLY, as in the reference. */
  object SeparatorExpansion extends Generator {
    val name = "SeparatorExpansion"
    private val endBrackets = "(?s)(.*)\\((.*)\\)$".r
    private val midBrackets = "(?s)(.*)\\(.*\\)(.*)".r
    private val excludedParenthesis = Set("", "non-protein coding")
    // stand-in for the reference's spaCy stop-word list (it filters whole
    // groups that are bare stopwords, e.g. "receptor (the)")
    private val stopwords = Set("the", "of", "a", "an", "and", "in", "to",
      "with", "by", "for", "on", "at", "from", "as", "is", "was", "type")
    def generate(s: String): Set[String] = {
      val bracketResults = scala.collection.mutable.Set.empty[String]
      val allGroupResults = scala.collection.mutable.Set.empty[String]
      if (s.contains('(') && s.contains(')')) {
        s match {
          case endBrackets(g1, g2) =>
            // groups compared UN-stripped against the exclusion list, then
            // added stripped; the rejoin concatenates the raw groups
            // (ref :125-133)
            val kept = Seq(g1, g2).filter(g =>
              !excludedParenthesis(g) &&
                !stopwords(g.toLowerCase(java.util.Locale.ROOT)))
            kept.foreach(g => bracketResults += g.trim)
            allGroupResults += kept.mkString("")
          case midBrackets(g1, g2) =>
            allGroupResults += Seq(g1, g2).map(_.trim).mkString(" ")
          case _ =>
        }
      }
      bracketResults.toList.foreach { x =>
        if (x.contains('/'))
          x.split('/').map(_.trim).filter(_.nonEmpty).foreach(bracketResults += _)
        if (x.contains(','))
          x.split(',').map(_.trim).filter(_.nonEmpty).foreach(bracketResults += _)
      }
      // trim and drop blanks: the raw-group rejoin can carry edge whitespace
      // ("receptor (the)" → "receptor ") or be empty when every group was
      // excluded — neither is a usable synonym
      (bracketResults ++ allGroupResults).map(_.trim).filter(_.nonEmpty).toSet - s
    }
  }

  /** Remove ALL stopword tokens (ref StopWordRemover :157-175 — its exact
    * stop-word set; emits only when at least one token was removed). */
  final class StopWordRemover(stopwords: Set[String]) extends Generator {
    val name = "StopWordRemover"
    def generate(s: String): Set[String] = {
      val toks = s.split("\\s+").toSeq.filter(_.nonEmpty)
      val kept = toks.filterNot(t => stopwords(t.toLowerCase(java.util.Locale.ROOT)))
      // all-stopword input would emit "" — never plant an empty synonym
      if (kept.size != toks.size && kept.nonEmpty) Set(kept.mkString(" ")) - s
      else Set.empty
    }
  }
  object StopWordRemover {
    val default = new StopWordRemover(Set(
      "of", "and", "in", "to", "with", "caused", "involved", "by", "the"))
  }

  /** Bidirectional greek-letter ↔ name substitution (ref StringReplacement
    * with GreekSymbolSubstitution :177-270). */
  object GreekSubstitution extends Generator {
    val name = "GreekSubstitution"

    /** The reference's ALL_SUBS construction (GreekSymbolSubstitution,
      * synonym_generation.py:177-198): greek char → {spelling, spelling's
      * first letter, case-flipped greek char}; spelling → {every greek char
      * with that spelling}. */
    private[ontology] val AllSubs: Map[String, Set[String]] = {
      val m = scala.collection.mutable.Map.empty[String, Set[String]]
        .withDefaultValue(Set.empty)
      Normalizer.GreekSubs.foreach { case (g, sp) =>
        m(g) = m(g) + sp + sp.substring(0, 1)
        m(sp) = m(sp) + g
        val flipped =
          if (g.exists(_.isLower)) g.toUpperCase(java.util.Locale.ROOT)
          else g.toLowerCase(java.util.Locale.ROOT)
        if (flipped != g) m(g) = m(g) + flipped
      }
      m.toMap
    }

    private val fixes: Set[String] =
      Normalizer.Dashes.map(_.toString) + " "

    // DOCUMENTED DEVIATION from the reference: a spelled-name candidate only
    // matches at a non-letter boundary, so "eta" never fires inside "beta".
    // The reference acknowledges this exact flaw with xfail-marked tests
    // (test_synonym_generators.py "beta test" / "alpha beta test") — the
    // guard makes those tests' EXPECTED sets the actual output.
    private def boundaryOk(s: String, idx: Int, candidate: String): Boolean =
      !candidate.head.isLetter || candidate.length == 1 ||
        idx == 0 || !s.charAt(idx - 1).isLetter

    // right-boundary guard for the suffix form (fix+candidate): a spelled
    // name must not continue into a longer word (" beta" inside " betaine")
    private def boundaryOkRight(s: String, endIdx: Int, candidate: String): Boolean =
      !candidate.last.isLetter || candidate.length == 1 ||
        endIdx >= s.length || !s.charAt(endIdx).isLetter

    private def containsGuardedSuffix(s: String, target: String,
        candidate: String): Boolean = {
      var i = s.indexOf(target)
      while (i >= 0) {
        if (boundaryOkRight(s, i + target.length, candidate)) return true
        i = s.indexOf(target, i + 1)
      }
      false
    }

    private def replaceGuardedSuffix(s: String, target: String,
        replacement: String, candidate: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val at = s.indexOf(target, i)
        if (at < 0) { sb.append(s.substring(i)); i = s.length }
        else {
          sb.append(s.substring(i, at))
          if (boundaryOkRight(s, at + target.length, candidate)) {
            sb.append(replacement); i = at + target.length
          } else { sb.append(s.charAt(at)); i = at + 1 }
        }
      }
      sb.toString
    }

    private def containsGuarded(s: String, target: String): Boolean = {
      var i = s.indexOf(target)
      while (i >= 0) {
        if (boundaryOk(s, i, target)) return true
        i = s.indexOf(target, i + 1)
      }
      false
    }

    private def replaceGuarded(s: String, target: String,
        replacement: String): String = {
      // replace every boundary-valid occurrence of `target`
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val at = s.indexOf(target, i)
        if (at < 0) { sb.append(s.substring(i)); i = s.length }
        else {
          sb.append(s.substring(i, at))
          if (boundaryOk(s, at, target)) { sb.append(replacement); i = at + target.length }
          else { sb.append(s.charAt(at)); i = at + 1 }
        }
      }
      sb.toString
    }

    /** Variant cap: the combination accumulation is exponential in the
      * number of distinct greek symbols in one synonym (the reference is
      * unbounded — fine for real ontology labels, a liability against a
      * hostile synonym like "alpha beta gamma ... kappa" which would
      * otherwise materialize ~4^k strings inside one executor task). The
      * cap is far above any real label's variant count; iteration is in
      * sorted key order so the surviving subset is deterministic. */
    private val MaxVariants = 4096

    /** Ref StringReplacement._generate_greek_subs (:236-270): a candidate
      * adjacent to a dash or space in the ORIGINAL string substitutes over
      * every previously generated variant too, so multiple greek symbols in
      * one synonym yield the full combination set. */
    def generate(s: String): Set[String] = {
      val results = scala.collection.mutable.Set.empty[String]
      val stripped = s.trim
      var accumulated = Set(stripped)
      AllSubs.toSeq.sortBy(_._1).foreach { case (candidate, replacements) =>
        fixes.foreach { fix =>
          val prefix = containsGuarded(s, candidate + fix)
          val suffix = containsGuardedSuffix(s, fix + candidate, candidate)
          if ((prefix || suffix) && results.size < MaxVariants) {
            val step = scala.collection.mutable.Set.empty[String]
            accumulated.foreach { cur =>
              replacements.foreach { r =>
                if (prefix && results.size < MaxVariants) {
                  val v = replaceGuarded(cur, candidate + fix, r + fix)
                  step += v; results += v
                }
                if (suffix && results.size < MaxVariants) {
                  val v = replaceGuardedSuffix(cur, fix + candidate,
                    fix + r, candidate)
                  step += v; results += v
                }
              }
            }
            accumulated = accumulated ++ step
          }
        }
      }
      results.toSet - s - stripped
    }
  }

  /** Substring replacement from a dict, plus digit-aware prefixed forms
    * (ref StringReplacement :201-233 with include_greek=False — the greek
    * plane is [[GreekSubstitution]]). */
  final class StringReplacement(
      replacementDict: Map[String, Seq[String]] = Map.empty,
      digitAwareReplacementDict: Map[String, Seq[String]] = Map.empty
  ) extends Generator {
    val name = "StringReplacement"
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      replacementDict.foreach { case (target, reps) =>
        if (s.contains(target))
          reps.foreach(r => out += s.replace(target, r).trim)
      }
      digitAwareReplacementDict.foreach { case (target, reps) =>
        val m = java.util.regex.Pattern
          .compile(java.util.regex.Pattern.quote(target) + "[0-9]+").matcher(s)
        val matches = scala.collection.mutable.Set.empty[String]
        while (m.find()) matches += m.group()
        matches.foreach { hit =>
          val number = hit.substring(target.length)
          reps.foreach(r => out += s.replace(hit, r + number).trim)
        }
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
    * TokenListReplacementGenerator :339-384: a token whose LOWER form is in
    * a sublist is replaced by EVERY token of that sublist — including
    * itself, so the original string is part of the output — via whole-string
    * substring replacement of the matched token text). */
  final class TokenListReplacement(groups: Seq[Seq[String]]) extends Generator {
    val name = "TokenListReplacement"
    def generate(s: String): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      s.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val lower = tok.toLowerCase(java.util.Locale.ROOT)
        groups.foreach { g =>
          if (g.exists(_.toLowerCase(java.util.Locale.ROOT) == lower)) {
            // whole-token replacement only (the reference's raw substring
            // replace also rewrites "typical" inside "atypical" — a
            // corrupting flaw, deviated from deliberately)
            val pat = "(?<![\\p{L}\\p{N}])" +
              java.util.regex.Pattern.quote(tok) + "(?![\\p{L}\\p{N}])"
            g.foreach(alt => out += s.replaceAll(pat,
              java.util.regex.Matcher.quoteReplacement(alt)))
          }
        }
      }
      out.toSet
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
