package graft

import org.apache.spark.sql.functions._

/** Stats-fed planning: the 100 TB story should not rest on AQE alone — a
  * cluster that runs `ANALYZE TABLE` feeds the COST-BASED optimizer
  * row/column statistics that flip join decisions BEFORE execution, where
  * AQE can only repair them afterwards (and only at exchange boundaries).
  *
  * The demonstration table is adversarial for a size-only estimator: a
  * wide constant string column run-length-encodes to a few KB of parquet,
  * so the FILE-size estimate says "tiny — broadcast it", while the actual
  * in-memory relation is tens of MB (150k rows × ~400B). `ANALYZE TABLE
  * ... FOR ALL COLUMNS` records rowCount + avgLen; with CBO enabled the
  * planner re-estimates width × rows and withdraws the broadcast. That
  * estimate-vs-reality gap is exactly how compressed 100 TB dims OOM
  * driver/executors when broadcast by file size.
  */
class StatsPlanningSpec extends SparkSpec {

  /** Run `body` with confs set, restoring prior values after. */
  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prior = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE row/column stats withdraw a file-size-justified broadcast") {
    val tbl = "stats_dim_demo"
    val loc = java.nio.file.Files.createTempDirectory("stats_dim").toString
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // 150k rows of a constant 400-char pad: parquet RLE → a few KB on disk,
    // ~60 MB as rows — the file-size estimator is off by four orders
    spark.range(150000)
      .select(col("id").as("k"), lpad(lit("x"), 400, "x").as("pad"))
      .write.mode("overwrite").option("path", loc).saveAsTable(tbl)
    val fact = spark.range(2000000)
      .select((col("id") % 150000).as("k"), col("id").as("m"))
    def plan(): String =
      fact.join(spark.table(tbl), "k")
        .groupBy("pad").agg(count(lit(1)).as("n"))
        .queryExecution.sparkPlan.toString // pre-AQE: the STATIC decision
    try withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      // no stats yet: the only signal is the (tiny) parquet byte size
      plan() should include("BroadcastHashJoin")
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      // rowCount × avgLen says ~60 MB — over the 10 MB broadcast threshold
      val after = plan()
      after should not include "BroadcastHashJoin"
      after should include("SortMergeJoin")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("runtime bloom filter: a selective dim predicate injects might_contain into the fact side") {
    // The row-level complement of join_dpp's partition-level pruning: when
    // the fact is NOT partitioned on the join key, Spark can still build a
    // bloom filter from the filtered dim side and semi-filter fact rows
    // BEFORE the join shuffle — at 100 TB this is what keeps a selective
    // dim join from shuffling the whole fact table. Local file sizes are
    // far under the production thresholds, so the thresholds are lowered
    // to let the optimizer make the same decision it would at scale
    // (broadcast disabled: with a broadcast join Spark rightly skips the
    // bloom — the hashed relation already filters at the join).
    val dir = java.nio.file.Files.createTempDirectory("bloom_demo").toString
    spark.range(1000000).select(col("id").as("k"), (col("id") % 97).as("m"))
      .write.parquet(s"$dir/fact")
    spark.range(10000).select(col("id").as("k"), (col("id") % 5).as("cat"))
      .write.parquet(s"$dir/dim")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 0)
      val plan = fact.join(dim, "k").groupBy("cat")
        .agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      plan should include("might_contain") // the injected runtime filter probe
      plan should include("bloom_filter_agg") // built from the filtered dim
    }
  }
}
