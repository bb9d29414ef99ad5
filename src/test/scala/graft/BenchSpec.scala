package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench tripwire (VERDICT r03 §wrong-3: a noise-contaminated single
  * sample became the round's official number and nothing caught it). The
  * committed per-query budget resource plus min-of-N reps make a real
  * regression distinguishable from host noise — these cases pin the
  * mechanism itself. */
class BenchSpec extends AnyFunSuite {

  test("committed budget resource loads and covers the declared queries") {
    val b = Bench.budgets
    assert(b.nonEmpty, "bench_budget.json missing from resources")
    // every budgeted name is a declared query (stale entries would make the
    // tripwire silently inert after a rename)
    val declared = SparkEntry.allQueries.map(_.name).toSet
    val stale = b.keySet -- declared
    assert(stale.isEmpty, s"budget entries for unknown queries: $stale")
    assert(b.values.forall(v => v > 0 && v < 60), "budget seconds sane")
  }

  test("tripwire flags an injected slowdown and only that") {
    val name = Bench.budgets.head._1
    val budget = Bench.budgets(name)
    val ok = Map(name -> budget * 1.5) // noisy but under 3x: not flagged
    assert(Bench.slowOnes(ok).isEmpty)
    val slow = Map(name -> budget * Bench.tripwireFactor * 1.1)
    assert(Bench.slowOnes(slow) == slow)
    // queries with no committed budget (new this round) are never flagged
    assert(Bench.slowOnes(Map("q_not_budgeted" -> 1e9)).isEmpty)
  }
}
