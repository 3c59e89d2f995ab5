package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench noise-guard plumbing (round-7 directive #1): prior-medians
  * parsing and the calibration probe's fixed-work contract. The guard's
  * flag/re-run logic itself is exercised end-to-end by the bench drive. */
class BenchGuardSpec extends AnyFunSuite {

  test("loadPrior parses the committed prior-medians artifact") {
    val prior = Bench.loadPrior("BENCH_prior_medians.json")
    assert(prior.size >= 50, s"expected a full suite of priors, got ${prior.size}")
    assert(prior.values.forall(v => v > 0 && v < 600))
    assert(prior.contains("kg_triples") && prior.contains("dedup_minhash"))
  }

  test("loadPrior degrades to empty on a missing file (guard disabled, not fatal)") {
    assert(Bench.loadPrior("/nonexistent/prior.json").isEmpty)
  }

  test("an EXPLICIT prior override that is unreadable fails loudly instead " +
    "of silently disabling the guard") {
    val e = intercept[RuntimeException] {
      Bench.loadPrior("/nonexistent/prior.json", explicit = true)
    }
    assert(e.getMessage.contains("unreadable"))
  }

  test("calibration probe returns a positive, plausible wall time") {
    val s = Bench.calibrationProbe()
    // fixed single-threaded work: ~0.2-0.4 s unloaded, more under load;
    // bounds only assert sanity, not speed
    assert(s > 0.01 && s < 60.0, s"probe measured $s s")
  }
}
