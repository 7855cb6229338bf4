package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the events-interval contract bound that join_interval_overlap's
  * bucketing DEPENDS on: every interval [ts, ts + props.k min] must span
  * ≤ 2 fixed-width buckets, which holds iff max(props.k) ≤
  * MaxIntervalMinutes (= the bucket width). If a fixture refresh ever
  * ships a longer interval the op stays CORRECT (the sequence() covers
  * all buckets an interval touches) but the documented ≤2-bucket
  * candidate bound — and the plan-shape/occupancy guarantees derived from
  * it — silently degrade; this spec turns that silent degradation into a
  * red test naming the constant to bump.
  */
class IntervalContractSpec extends SparkSpec {

  test("fixture intervals obey the MaxIntervalMinutes bucket-width bound") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val maxK = graft.Tables(spark, s"/root/testdata/$sf", "events")
        .select(max(intervalK)).collect()(0).getInt(0)
      assert(maxK >= 1, s"$sf: contract vacuous — no positive-k intervals")
      assert(maxK <= MaxIntervalMinutes,
        s"$sf: max props.k = $maxK min exceeds MaxIntervalMinutes " +
          s"(=$MaxIntervalMinutes) — join_interval_overlap's <=2-bucket " +
          "candidate bound no longer holds; raise the constant in " +
          "ops/package.scala (bucket width derives from it)")
    }
  }

  test("bucket width derives from the shared contract constants") {
    assert(MaxIntervalMinutes * IntervalMinuteUs == 6000000000L)
  }
}
