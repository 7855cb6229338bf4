package graft

/** Plan-quality regression tests: the properties that make these operators
  * scale are visible in the physical plan, so pin them — a refactor that
  * silently breaks pushdown or broadcasts would pass value-equality tests
  * while regressing 100× at scale.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("scan_projected prunes the parquet read schema to selected columns") {
    val plan = planOf("scan_projected")
    plan should include("ReadSchema")
    // the 12 unselected lineitem columns must not reach the scan
    plan should not include "l_comment"
    plan should not include "l_extendedprice"
  }

  test("filter_pred pushes every predicate into the scan") {
    val plan = planOf("filter_pred")
    // (the PushedFilters list is elided in toString — check the head)
    plan should include("PushedFilters: [IsNotNull(o_totalprice)")
    plan should include("In(o_orderstatus, [F,O])")
  }

  test("join_broadcast plans broadcast hash joins for bounded dims") {
    planOf("join_broadcast") should include("BroadcastHashJoin")
  }

  test("limit_topk plans TakeOrderedAndProject (per-partition heaps, no full sort)") {
    planOf("limit_topk") should include("TakeOrderedAndProject")
  }

  test("agg_group plans partial+final hash aggregation") {
    val plan = planOf("agg_group")
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("dedup ops contain no cartesian product") {
    Seq("dedup_minhash", "dedup_simhash", "dedup_ngram").foreach { name =>
      withClue(name) {
        planOf(name) should not include "CartesianProduct"
      }
    }
  }

  test("operators keep UDFs off the hot path (vec_dot excepted by design)") {
    // the only ScalaUDF-bearing plan allowed is none: dedup_embed's
    // prefilter uses the codegen'd VecDot expression, not a UDF
    Seq("dedup_embed", "sim_search", "agg_group", "join_asof",
        "embed_normalize", "vec_quantize", "chunk_split").foreach { name =>
      withClue(name) { planOf(name) should not include "ScalaUDF" }
    }
  }

  test("tpch_q5 broadcasts the bounded dims and aggregates partial+final") {
    val plan = planOf("tpch_q5")
    plan should include("BroadcastHashJoin")
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("tpch_q3 tops out in TakeOrderedAndProject (no global sort for top-10)") {
    planOf("tpch_q3") should include("TakeOrderedAndProject")
  }

  test("sample_stratified is a pure scan-stage filter (only the final sort exchanges)") {
    val plan = planOf("sample_stratified")
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("join_skew_salted actually joins on the salt key") {
    planOf("join_skew_salted") should include("__salt")
  }

  test("sink_bucketed: bucket layout replaces the aggregation shuffle") {
    val plan = SparkEntry.queries("sink_bucketed")(spark, dir)
      .queryExecution.executedPlan.toString
    plan should include("Bucketed: true")
    // the only exchange is the final ORDER BY's range partitioning — the
    // aggregate's hash distribution comes from the bucket layout
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }
}
