package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registration wrappers for Spark's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the exact pair
  * Catalyst's `InjectRuntimeFilter` rule plants when it decides a shuffle
  * join deserves a runtime semi-join filter. They are implemented and
  * codegen'd in spark-catalyst but NOT exposed in the function registry,
  * so a library that wants an EXPLICIT bloom prefilter (rather than hoping
  * the optimizer's size thresholds fire — they are tuned for >10 GB scans
  * and never trigger at test scale) has to register them itself.
  *
  * Both functions operate on xxhash64 longs (the same convention the
  * injected filters use): build with
  * `graft_bloom_agg(xxhash64(key), estItems, numBits)` → one BINARY blob,
  * probe with `graft_bloom_might_contain(lit(blob), xxhash64(key))`.
  * The blob literal is foldable, so the probe filter rides inside
  * whole-stage codegen on the scan side of the join — the 100 TB shape is
  * "aggregate the small side to one ~100 KB blob, ship it as a literal
  * (what Spark's own subquery reuse does), drop non-joining rows BEFORE
  * the big side's exchange".
  */
object Bloom {
  val aggName = "graft_bloom_agg"
  val mightName = "graft_bloom_might_contain"

  private val aggInfo =
    new ExpressionInfo(classOf[BloomFilterAggregate].getName, aggName)
  private val mightInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, mightName)

  private val aggBuilder: Seq[Expression] => Expression = {
    case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
    case other => throw new IllegalArgumentException(
      s"$aggName expects (xxhash64Col, estItems, numBits), got ${other.size} args")
  }
  private val mightBuilder: Seq[Expression] => Expression = {
    case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
    case other => throw new IllegalArgumentException(
      s"$mightName expects (bloomBinary, xxhash64Col), got ${other.size} args")
  }

  /** Imperative registration on an already-built session (the driver owns
    * session construction in the harness). Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(aggName), aggInfo, aggBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(mightName), mightInfo, mightBuilder)
  }
}
