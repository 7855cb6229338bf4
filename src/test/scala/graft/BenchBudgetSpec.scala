package graft

/** The per-op bench budget must stay in lockstep with the inventory: every
  * operator gets a ceiling when it lands (so a plan regression in a NEW op
  * is caught by the next bench run, not grandfathered in), and ceilings for
  * removed ops don't linger. The timing gate itself runs inside Bench
  * (SPARK_GRAFT_BUDGET=strict) where the measurement conditions are
  * controlled — a local[2] shared-JVM test suite is the wrong place to
  * time 169 sf0.1 queries.
  */
class BenchBudgetSpec extends SparkSpec {

  test("every query has a ceiling and every ceiling has a query") {
    val ops = SparkEntry.queries.keySet
    val budgeted = BenchBudget.ceilings.keySet
    ops.diff(budgeted) shouldBe empty   // new op without a budget
    budgeted.diff(ops) shouldBe empty   // stale budget for a removed op
  }

  test("ceilings are positive, finite, and not absurdly loose") {
    BenchBudget.ceilings.foreach { case (k, c) =>
      withClue(s"$k: ") {
        c should be > 0.0
        c should be < 60.0 // nothing at sf0.1 legitimately takes a minute
      }
    }
  }
}
