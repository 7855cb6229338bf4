package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the operator modules.
  *
  * `dsum`/`davg`: exact-decimal aggregation of double columns — both engines
  * round the same IEEE double to 2 decimals and sum exactly, so results are
  * independent of aggregation order (and of partition count at 100 TB).
  */
package object ops {
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)
}
