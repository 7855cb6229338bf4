package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each operator module contributes `Op`s (builder + optional DuckDB-oracle
  * SQL twin); this object assembles them into the contract maps.
  */
object SparkEntry {

  private val allOps: Seq[Op] = {
    val ops = Relational.ops ++ Aggregates.ops ++ Functions.ops ++ SinkOps.ops ++
      Events.ops ++ Llm.ops ++ Text.ops ++ Dedup.ops ++ Pipeline.ops ++
      Audit.ops ++ Composite.ops ++ Tpch.ops ++ Stats.ops
    // a name collision would silently drop an operator at toMap below
    val dups = ops.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate op names: ${dups.mkString(", ")}")
    ops
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(sql => op.name -> Op.pinNullOrder(sql))).toMap
}
