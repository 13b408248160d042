package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the floor-ledger update rule (Bench.ledgerStep): the drift
  * trigger's reference floors must ratchet down on clean evidence,
  * re-base on a plan change, and absorb a twice-confirmed slowdown —
  * but never inflate from a single noisy clean rep. The caller
  * guarantees only CLEAN observations (accepted quiet_min or
  * uncontended min) reach the rule; these tests pin what the rule does
  * with them. No SparkSession needed — the rule is pure. */
class BenchLedgerSpec extends AnyFunSuite {
  import Bench.{Floor, ledgerStep}

  test("a new query establishes its baseline with a clean streak") {
    assert(ledgerStep(None, 2.5, "aa") === Floor(2.5, "aa", 0))
  }

  test("clean evidence at-or-below the floor ratchets it down and " +
    "breaks any regression streak") {
    assert(ledgerStep(Some(Floor(2.5, "aa", 1)), 2.0, "aa")
      === Floor(2.0, "aa", 0))
    // within the 1.2x band but above the floor: floor unchanged, streak
    // still broken (the box was just a touch slower, not regressed)
    assert(ledgerStep(Some(Floor(2.0, "aa", 1)), 2.3, "aa")
      === Floor(2.0, "aa", 0))
  }

  test("one clean verdict above 1.2x only starts the streak — the floor " +
    "must not inflate from a single observation") {
    assert(ledgerStep(Some(Floor(2.0, "aa", 0)), 3.0, "aa")
      === Floor(2.0, "aa", 1))
  }

  test("the second consecutive clean verdict above 1.2x re-bases: a " +
    "twice-documented slowdown becomes the baseline instead of " +
    "flagging every future run") {
    assert(ledgerStep(Some(Floor(2.0, "aa", 1)), 3.1, "aa")
      === Floor(3.1, "aa", 0))
  }

  test("a changed plan fingerprint re-bases immediately — a " +
    "reformulation is a new baseline, not a regression") {
    assert(ledgerStep(Some(Floor(2.0, "aa", 1)), 5.0, "bb")
      === Floor(5.0, "bb", 0))
  }
}
