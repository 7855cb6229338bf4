package graft.engine

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The engine's user-function registry — the analog of the reference's
  * string-keyed transform dispatch table `aplicarTransformacion`
  * (reference: src/etl/ETLProcess.java:528-545), exposed as SQL functions so
  * raw-SQL extraction (R2) can use the same transforms interactively.
  *
  * Scalar transforms stay Catalyst expressions when used from the DataFrame
  * API ([[Transforms]]); these SQL registrations are the escape hatch for
  * the SQL surface. The typed [[Aggregator]] shows the engine's custom-UDAF
  * path: mergeable state, so Spark runs it partial+final like a built-in —
  * the property that makes a custom aggregate usable at 100 TB.
  */
object Udfs {

  /** MinHash signature as a typed Aggregator: per-group minimum of a 60-bit
    * hash column. Buffer = running min (mergeable across partitions). Used
    * as `minhash_agg(h)` in SQL — the custom-sketch registration path the
    * near-dup ops would use if their sketches weren't plain expressions. */
  private val minHashAgg: Aggregator[java.lang.Long, Long, Long] =
    new Aggregator[java.lang.Long, Long, Long] {
      def zero: Long = Long.MaxValue
      def reduce(b: Long, a: java.lang.Long): Long =
        if (a == null) b else math.min(b, a.longValue)
      def merge(b1: Long, b2: Long): Long = math.min(b1, b2)
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Register the engine's SQL-visible functions on a session. */
  def register(spark: SparkSession): Unit = {
    // reference transform dispatch (:533-544), SQL-callable; toString
    // coercion is the caller's cast, as in Transforms.coerce
    spark.udf.register("graft_lower", (s: String) => if (s == null) null else s.toLowerCase)
    spark.udf.register("graft_upper", (s: String) => if (s == null) null else s.toUpperCase)
    spark.udf.register("graft_concat_lit",
      (s: String, suffix: String) => if (s == null) null else s + suffix)
    spark.udf.register("minhash_agg", udaf(minHashAgg))
  }
}
