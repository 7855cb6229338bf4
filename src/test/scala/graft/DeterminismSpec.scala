package graft

/** The engine's determinism claim, tested directly: operator results must be
  * IDENTICAL (values and order) under a different shuffle parallelism —
  * the property that makes results reproducible across cluster sizes and
  * task retries at 100 TB. Uses `newSession()` (shared context, separate
  * SQLConf) with a co-prime partition count.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the ENTIRE declared inventory: every operator must reproduce
  // bit-identically under a different parallelism — partial aggregation,
  // windows, LSH banding, top-k ties, label propagation, decimal folds,
  // hash sampling, sketch-gated outputs, sink round-trips included
  private val sensitive: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  sensitive.foreach { name =>
    test(s"$name is bit-identical under different shuffle parallelism") {
      val alt = spark.newSession()
      alt.conf.set("spark.sql.shuffle.partitions", "7")
      // make the comparison non-vacuous: AQE coalescing would collapse both
      // runs to the same post-shuffle partitioning on tiny data, and the
      // shared CacheManager could serve the alt run from the base run's
      // cached plans (computed under base parallelism)
      alt.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val base = SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      val other = SparkEntry.queries(name)(alt, dir).collect().map(_.toString).toSeq
      other shouldBe base
    }
  }
}
