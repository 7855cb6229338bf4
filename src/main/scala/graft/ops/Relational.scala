package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator set from SURVEY.md §2.B — the query surface the
  * reference delegates to SQL Server via raw SQL
  * (reference: src/etl/ETLProcess.java:84-86,163-164), re-owned by Spark.
  *
  * Determinism conventions (oracle parity, SURVEY §5.2/§7.4):
  *  - every query ends in a total ORDER BY (unique key tiebreak);
  *  - double aggregates go through exact DECIMAL arithmetic and are cast
  *    back to double at the end, so Spark and DuckDB produce bit-identical
  *    values regardless of partial-aggregation order. At 100 TB this also
  *    keeps sums reproducible across different partition counts.
  */
object Relational {

  /** Exact-sum of a double column: decimal(18,2) in, double out.
    * Both engines round the same IEEE double to 2 decimals and sum exactly,
    * so the result is independent of aggregation order. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  private def davg(c: Column): Column = dsum(c) / count(lit(1))

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  // --------------------------------------------------------------------
  // agg_group — TPC-H Q1 shape. Hash aggregate with partial (map-side)
  // combine; at scale the shuffle carries only |groups| × partitions rows.
  // --------------------------------------------------------------------
  def aggGroup(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val disc  = li("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - li("l_discount").cast(DecimalType(18, 2)))
    val charge = disc * (lit(1).cast(DecimalType(18, 2)) + li("l_tax").cast(DecimalType(18, 2)))
    li.filter(li("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(li("l_returnflag"), li("l_linestatus"))
      .agg(
        dsum(li("l_quantity")).as("sum_qty"),
        dsum(li("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        davg(li("l_quantity")).as("avg_qty"),
        davg(li("l_extendedprice")).as("avg_price"),
        davg(li("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggGroupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
