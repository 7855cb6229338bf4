package graft

/** The engine's determinism claim, tested directly: operator results must be
  * IDENTICAL (values and order) under a different shuffle parallelism —
  * the property that makes results reproducible across cluster sizes and
  * task retries at 100 TB. Uses `newSession()` (shared context, separate
  * SQLConf) with a co-prime partition count.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ops whose internals exercise the risky shapes: partial aggregation,
  // windows, LSH banding, top-k ties, label propagation, decimal folds
  private val sensitive = Seq(
    "agg_group", "agg_percentile", "win_rank", "topk_per_group",
    "dedup_minhash", "dedup_cluster", "sim_search", "stream_session",
    "sink_upsert", "doc_fingerprint",
    // round 3: hash sampling, moment stats, funnel joins, top-k grams —
    // each combines partial aggregation or hash ranking with tie-bearing
    // top-k/window shapes
    "sample_stratified", "sample_per_group", "agg_stats", "event_funnel",
    "text_ngram_freq", "tpch_q3", "vec_quantize")

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
