package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantics of the lake-layout ops: the partition-pruned join and the raw
  * SQL front door. Plan shape is pinned in PlanAuditSpec; these prove the
  * pruned/delegated result equals a formulation that never saw the layout —
  * pruning and delegation must be pure optimizations, invisible in values.
  */
class LakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("join_dpp: the partition-pruned result equals the layout-free recompute") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val raw = Tables(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("y"), col("o_totalprice")).collect()
      .map(r => (nLong(r, 0), new JBD(nDouble(r, 1)).setScale(2, RoundingMode.HALF_UP)))
    val expect = raw.filter(_._1 % 2 == 0).groupBy(_._1).map { case (y, xs) =>
      y -> ((xs.length.toLong, xs.map(_._2).reduce(_ add _).doubleValue))
    }
    val got = SparkEntry.queries("join_dpp")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got shouldBe expect
    // pruning had something to prune: odd years exist in the data
    raw.exists(_._1 % 2 != 0) shouldBe true
  }

  test("sql_passthrough: the verbatim-SQL result equals the DataFrame formulation") {
    import org.apache.spark.sql.types.DecimalType
    val spend = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
    val expect = Tables(spark, dir, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum("spend").cast("double").as("segment_spend"))
    rowSet(SparkEntry.queries("sql_passthrough")(spark, dir)) shouldBe rowSet(expect)
  }
}
