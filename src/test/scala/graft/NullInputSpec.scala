package graft

import org.apache.spark.sql.functions.{array, lit, to_timestamp}
import org.apache.spark.sql.types._

/** Every operator against a fixture containing (a) a row whose every
  * non-key column is NULL and (b) a row of ZERO/EMPTY values (empty
  * strings, empty arrays, zeros, epoch timestamps): both are schema-legal,
  * and at 100 TB some upstream WILL eventually produce them. The exact
  * semantics (propagate, drop, score-as-null) are an op-level choice —
  * this sweep only asserts that no operator CRASHES (a generator like
  * sequence() with a null-derived bound, or an ANSI division by a zero
  * token count, throws rather than nulling out).
  */
class NullInputSpec extends SparkSpec {

  private def zeroValue(dt: DataType) = dt match {
    case StringType           => lit("")
    case ArrayType(et, _)     => array().cast(ArrayType(et))
    case TimestampType        => to_timestamp(lit("1970-01-01 00:00:00"))
    case DateType             => lit("1970-01-01").cast(DateType)
    case _: NumericType       => lit(0).cast(dt)
    case other                => lit(null).cast(other)
  }

  private lazy val nullDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    Tables.names.foreach { n =>
      val base = Tables(spark, "/root/testdata/sf0.001", n)
      val keys = graft.engine.Catalog.mergeKeys.getOrElse(n, Nil)
      val fields = base.schema.fields.toSeq
      // one all-null row (keys kept non-null — a fresh id value)
      val nullRow = base.limit(1).select(fields.map { f =>
        (if (keys.contains(f.name)) lit(999999).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)
      }: _*)
      // one zero/empty row
      val zeroRow = base.limit(1).select(fields.map { f =>
        (if (keys.contains(f.name)) lit(999998).cast(f.dataType)
         else zeroValue(f.dataType)).as(f.name)
      }: _*)
      base.limit(5).union(nullRow).union(zeroRow)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  /** fn_cast_null's contract IS plain ANSI cast semantics, which THROW on
    * malformed input by definition (CAST('' AS INT)); its documented
    * error-tolerant twin is fn_try, which this sweep does cover. */
  private val throwsByContract = Set("fn_cast_null")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot(q => throwsByContract(q._1))
    .foreach { case (name, fn) =>
      test(s"$name tolerates an all-null row without throwing") {
        noException should be thrownBy fn(spark, nullDir).collect()
      }
    }

  test("fn_cast_null throws on malformed input BY CONTRACT (ANSI cast; fn_try is the tolerant twin)") {
    an[Exception] should be thrownBy
      SparkEntry.queries("fn_cast_null")(spark, nullDir).collect()
  }
}
