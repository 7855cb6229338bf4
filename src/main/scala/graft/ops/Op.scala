package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2.B: a DataFrame builder plus (optionally)
  * its DuckDB-oracle SQL twin. `SparkEntry` assembles the modules' `ops`
  * sequences into the driver-contract maps.
  *
  * Determinism conventions (SURVEY §5.2/§7.4): every query ends in a total
  * ORDER BY (unique tiebreak key), and double aggregates go through exact
  * DECIMAL arithmetic so Spark and DuckDB are bit-identical regardless of
  * partial-aggregation order. At 100 TB the decimal discipline also keeps
  * sums reproducible across partition counts.
  */
final case class Op(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def apply(name: String, sql: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(name, build, Some(sql))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(name, build, None)
}
