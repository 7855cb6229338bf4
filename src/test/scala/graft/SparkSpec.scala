package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for the test suite — one JVM-wide session so
  * the whole suite pays SparkSession startup once.
  */
object SparkSpec {
  lazy val spark: SparkSession = Graft.configure(SparkSession.builder())
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Collect to a sorted set of row-seqs for order-insensitive compare. */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq
}
