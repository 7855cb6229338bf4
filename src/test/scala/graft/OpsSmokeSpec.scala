package graft

/** Smoke test over the whole declared operator inventory: every
  * `SparkEntry.queries` entry must build, run, and return rows at sf0.001.
  * (Exact values are the DuckDB-oracle gate's job — this catches ops that
  * break at plan time, return empty/trivial results, or regress when a
  * shared helper changes.)
  *
  * A few ops are legitimately empty at tiny scale (near-dup pair sets);
  * they only need to run cleanly.
  */
class OpsSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val mayBeEmpty = Set(
    "dedup_minhash", "dedup_simhash", "dedup_ngram", "dedup_embed",
    "dedup_cluster", "join_anti",
    // an anomaly audit over clean data is legitimately empty: sf0.001's
    // 150 customers have max robust-z 2.7 (< the canonical 3 gate); the
    // sf0.01 oracle run flags 15 rows, so non-trivial output IS verified
    "anomaly_mad")

  test("entry returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every declared query has an oracle or is documented non-SQL") {
    // every key resolves; oracleSql keys ⊆ queries keys
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"op $name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) {
        withClue(s"$name returned 0 rows: ") { n should be > 0L }
      }
    }
  }
}
