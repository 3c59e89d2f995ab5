package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.MentionConfidence.{Possible, Probable}
import graft.ontology.Behaviour
import graft.ontology.Curation._
import graft.ontology.SynonymSpec

/** Ports kazu/tests/test_conflict_analyser.py (305 LoC, the r1-VERDICT done
  * bar for autocuration depth): every scenario runs across the three autofix
  * strategies with the reference's expected report shapes.
  */
class ConflictAnalyserSpec extends AnyFunSuite {

  private val allStrategies =
    Seq(Autofix.Optimistic, Autofix.Pessimistic, Autofix.None)

  private def syn(t: String, conf: Int, cs: Boolean) = SynonymSpec(t, cs, conf)
  private def res(behaviour: String, syns: SynonymSpec*) =
    CurationResource(syns.toSet, behaviour)

  test("case conflict within a single resource (ref :12-58)") {
    allStrategies.foreach { strategy =>
      val conflicted = Set(res(Behaviour.AddForNerAndLinking,
        syn("hello", Probable, cs = true), syn("Hello", Probable, cs = false)))
      val report = new ConflictAnalyser("test", strategy)
        .verifyResourceSetIntegrity(conflicted)
      if (strategy != Autofix.None) {
        assert(report.cleanResources.size == 1)
        assert(report.mergedResources.isEmpty)
        assert(report.normalisationConflicts.isEmpty)
        assert(report.caseConflicts.isEmpty)
        val forms = report.cleanResources.head.activeNerSynonyms
        if (strategy == Autofix.Optimistic) assert(forms.forall(!_.caseSensitive))
        else assert(forms.forall(_.caseSensitive))
      } else {
        assert(report.cleanResources.isEmpty)
        assert(report.mergedResources.isEmpty)
        assert(report.normalisationConflicts.isEmpty)
        assert(report.caseConflicts.contains(conflicted))
      }
    }
  }

  test("same norm + behaviour: resources merge cleanly (ref :62-100)") {
    val expectedMerged = Seq(
      syn("hello", Probable, cs = true), syn("Hello", Possible, cs = false))
    allStrategies.foreach { strategy =>
      val input = Set(
        res(Behaviour.AddForNerAndLinking, expectedMerged(0)),
        res(Behaviour.AddForNerAndLinking, expectedMerged(1)))
      val report = new ConflictAnalyser("test", strategy)
        .verifyResourceSetIntegrity(input)
      assert(report.cleanResources.size == 1)
      assert(report.mergedResources.size == 1)
      assert(report.normalisationConflicts.isEmpty)
      assert(report.caseConflicts.isEmpty)
      // cs PROBABLE > ci POSSIBLE is a legal ranking — synonyms unchanged
      assert(report.cleanResources.head.activeNerSynonyms == expectedMerged.toSet)
    }
  }

  test("case conflict across multiple resources (ref :103-154)") {
    allStrategies.foreach { strategy =>
      val input = Set(
        res(Behaviour.AddForNerAndLinking, syn("hello", Probable, cs = true)),
        res(Behaviour.AddForNerAndLinking, syn("Hello", Probable, cs = false)))
      val report = new ConflictAnalyser("test", strategy)
        .verifyResourceSetIntegrity(input)
      assert(report.mergedResources.size == 1)
      assert(report.normalisationConflicts.isEmpty)
      if (strategy != Autofix.None) {
        assert(report.cleanResources.size == 1)
        assert(report.caseConflicts.isEmpty)
        val forms = report.cleanResources.head.activeNerSynonyms
        if (strategy == Autofix.Optimistic) assert(forms.forall(!_.caseSensitive))
        else assert(forms.forall(_.caseSensitive))
      } else {
        assert(report.cleanResources.isEmpty)
        assert(report.caseConflicts.size == 1)
      }
    }
  }

  test("simultaneous normalisation and case conflicts (ref :157-305)") {
    val mergeable1 = res(Behaviour.AddForNerAndLinking,
      syn("Estrogens, conjugated synthetic a", Probable, cs = true))
    val mergeable2 = res(Behaviour.AddForNerAndLinking,
      syn("Estrogens,conjugated synthetic a", Probable, cs = true))
    val linkingOnly = res(Behaviour.AddForLinkingOnly,
      syn("Estrogens ,conjugated synthetic a", Probable, cs = true))
    val dropResource = res(Behaviour.DropForLinking,
      syn("Estrogens, conjugated synthetic a", Probable, cs = false))
    val caseConflictRes = res(Behaviour.AddForNerAndLinking,
      syn("ESTROGENS, CONJUGATED SYNTHETIC A", Probable, cs = false))

    // the scenario depends on the normalizer treating the all-caps variant
    // as symbolic (distinct syn_norm) while the mixed-case variants merge
    val norm = (s: String) => graft.text.Normalizer.normalize(s, "drug")
    assert(norm("Estrogens, conjugated synthetic a") ==
      norm("Estrogens,conjugated synthetic a"))
    assert(norm("Estrogens, conjugated synthetic a") ==
      norm("Estrogens ,conjugated synthetic a"))
    assert(norm("ESTROGENS, CONJUGATED SYNTHETIC A") !=
      norm("Estrogens, conjugated synthetic a"))

    allStrategies.foreach { strategy =>
      val analyser = new ConflictAnalyser("drug", strategy)

      // mergeable: m1+m2 merge, then case-conflict with the all-caps resource
      val mergeableReport = analyser.verifyResourceSetIntegrity(
        Set(mergeable1, mergeable2, caseConflictRes))
      if (strategy != Autofix.None) {
        assert(mergeableReport.cleanResources.size == 2)
        assert(mergeableReport.mergedResources.size == 1)
        assert(mergeableReport.normalisationConflicts.isEmpty)
        assert(mergeableReport.caseConflicts.isEmpty)
        mergeableReport.cleanResources.foreach { r =>
          if (strategy == Autofix.Optimistic)
            assert(r.activeNerSynonyms.forall(!_.caseSensitive))
          else assert(r.activeNerSynonyms.forall(_.caseSensitive))
        }
      } else {
        assert(mergeableReport.cleanResources.isEmpty)
        assert(mergeableReport.mergedResources.size == 1)
        assert(mergeableReport.normalisationConflicts.isEmpty)
        assert(mergeableReport.caseConflicts.size == 1)
      }

      // unmergeable: same norm but different behaviour → norm conflict;
      // the all-caps resource stays clean until the conflict is resolved
      Seq(linkingOnly, dropResource).foreach { other =>
        val conflictSet = Set(mergeable1, other, caseConflictRes)
        val report = analyser.verifyResourceSetIntegrity(conflictSet)
        if (strategy != Autofix.None) {
          assert(report.cleanResources.size == 2)
          assert(report.mergedResources.size == 1)
          assert(report.normalisationConflicts.isEmpty)
          assert(report.caseConflicts.isEmpty)
        } else {
          assert(report.cleanResources == Set(caseConflictRes))
          assert(report.mergedResources.isEmpty)
          assert(report.normalisationConflicts == Set(Set(mergeable1, other)))
          assert(report.caseConflicts.isEmpty)
        }
      }
    }
  }
}
