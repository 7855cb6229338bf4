package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
