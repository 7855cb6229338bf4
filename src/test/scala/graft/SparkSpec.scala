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

  /** Fixture-tolerant numeric getters: the driver refreshes /root/testdata
    * and can change a column's physical type (int↔long, float↔double)
    * mid-round, so RAW-table numerics collected in tests are read via
    * Number — a refresh then fails a value compare informatively instead
    * of throwing ClassCastException. Engine OUTPUT columns keep typed
    * getters: their types are part of the op's contract. */
  def nLong(r: Row, i: Int): Long = r.getAs[java.lang.Number](i).longValue
  def nDouble(r: Row, i: Int): Double = r.getAs[java.lang.Number](i).doubleValue

  /** Exact epoch-µs of a collected timestamp value, whichever surface the
    * fixture generation produced: an instant (java.sql.Timestamp — strip
    * the fractional-second millis getTime() already carries before adding
    * the full µs-of-second back) or TIMESTAMP_NTZ (java.time.LocalDateTime;
    * the session tz is pinned UTC, so the wall reading IS the instant). */
  def epochUs(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      (t.getTime - t.getNanos / 1000000) * 1000 + t.getNanos / 1000
    case t: java.time.LocalDateTime =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    case other => fail(s"not a timestamp value: $other")
  }
}
