package graft.engine

import graft.SparkSpec

/** Direct tests for the connected-components kernel behind dedup_cluster —
  * in particular the claim that pointer jumping makes the round count
  * O(log diameter), so the 25-round cap is principled: a 400-deep chain
  * (diameter 400, far beyond 25 naive label-propagation rounds) must
  * converge under the default cap. A propagation-only implementation fails
  * this test with the loud "not converged" error.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)],
      maxRounds: Int = 25): Map[Long, Long] =
    Graph.connectedComponents(
        pairs.toDF("id_a", "id_b"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("separate components each map to their own minimum id") {
    val got = components(Seq((2L, 5L), (5L, 9L), (20L, 21L)))
    got shouldBe Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 20L -> 20L, 21L -> 20L)
  }

  test("a 400-deep chain converges under the 25-round cap (pointer jumping)") {
    // path graph 0-1-2-...-400: diameter 400; naive min-label propagation
    // needs ~400 rounds, pointer jumping ~log2(400)+3 ≈ 12
    val chain = (0L until 400L).map(i => (i, i + 1))
    val got = components(chain)
    got.size shouldBe 401
    all(got.values) shouldBe 0L
  }

  test("duplicate and reversed-duplicate edges do not change the result") {
    // tolerated per the contract: duplicates widen the neighbour join but
    // the min-aggregate result is unchanged
    val got = components(Seq((1L, 2L), (1L, 2L), (2L, 3L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("an isolated vertex never appears (no edges, no row)") {
    val got = components(Seq((7L, 8L)))
    got.keySet shouldBe Set(7L, 8L)
  }

  test("an empty edge list yields an empty result, not a crash") {
    // regression: the label-sum convergence aggregate is NULL over zero
    // rows, which used to trip the overflow guard on round 1
    components(Seq.empty) shouldBe Map.empty
  }
}
