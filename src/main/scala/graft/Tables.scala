package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver's star schema (see FIXTURES.md).
  *
  * Stands in for the reference's JDBC source scan
  * (reference: src/etl/ETLProcess.java:66-75,163-164). At cluster scale the
  * same call reads a partitioned directory; Spark's DataSource v2 handles
  * split planning, predicate pushdown and column pruning, so every operator
  * built on top of this inherits scan-level pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spark 4 rejects parquet TIMESTAMP(NANOS) outright; `nanosAsLong` reads
    * nanos as long, which we truncate to a microsecond TimestampType column
    * (SURVEY §7.4 — the driver data has zero sub-microsecond components, so
    * this is lossless).
    *
    * The flag is an all-or-nothing SESSION config (no per-read option
    * exists), so library entry points (Verify/Bench/Explain, tests) set it
    * at session construction via [[Graft.configure]]. As a fallback for
    * driver-owned sessions we set it here too — but only when loading
    * `events` (the sole ns-timestamp table) and only if the caller hasn't
    * EXPLICITLY set the flag either way (sessionState.conf.contains sees
    * only explicit entries, not the registered default), keeping the
    * loader side-effect-free on every other path and never overriding a
    * deliberate `false`. */
  private val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events" && !spark.sessionState.conf.contains(NanosFlag))
      spark.conf.set(NanosFlag, "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
