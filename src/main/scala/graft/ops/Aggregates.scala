package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Typed row for the `typed_agg` Dataset[T] path — top-level so the
  * case-class Encoder carries no outer reference. Option fields, not
  * primitives: parquet columns are nullable, and a primitive Double in
  * the case class would throw at deserialization on the first null row
  * (caught by the all-null sweep) — the typed API makes nullability an
  * explicit type, which is half its point. */
case class LiTyped(l_returnflag: Option[String], l_quantity: Option[Double])

/** Aggregation + window operators (SURVEY §2.B "Aggregations" / "Window
  * functions"). All aggregates are hash aggregates with map-side partial
  * combine; grouping-set variants expand the grouping keys once and reuse the
  * same shuffle. Window ops shuffle once on the partition key.
  */
object Aggregates {

  private val aggDistinct = Op("agg_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp, COUNT(DISTINCT l_partkey) AS n_part,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    // r13: exchange-before-partial (the percentile-family fix below) A/B'd
    // WORSE here (0.77 -> 1.44 s) — countDistinct's partial pass is cheap
    // and the exchange shuffles 3 fact columns for nothing. Left alone.
    t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  // HLL sketch vs exact: the oracle pins the accuracy claim (rel-err ≤ 5%)
  // rather than the sketch value itself (DuckDB's HLL differs from Spark's).
  // At 100 TB approx_count_distinct is the only sane distinct-count: the
  // sketch is mergeable, so the shuffle carries one sketch per partition
  // instead of the distinct values themselves.
  // The exact count is part of the output so the oracle hash-verifies real
  // values, not just the tolerance flag; the exact side exists ONLY for
  // verification — the production path at 100 TB is the sketch alone (HLL
  // partials merge, so the shuffle carries one sketch per partition).
  private val aggApproxDistinct = Op("agg_approx_distinct",
    """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS exact, true AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_suppkey"), 0.02).as("approx"),
        countDistinct(col("l_suppkey")).as("exact"))
      .select(col("l_returnflag"), col("exact"),
        (abs(col("approx") - col("exact")) <= col("exact") * 0.05).as("approx_ok"))
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------------------
  // agg_sketch_partial — PERSISTED mergeable sketches (the incremental-
  // stats pattern agg_approx_distinct's inline sketch implies): build one
  // HLL sketch per shard (source), then answer the global question by
  // UNIONING the shard sketches — no second pass over the data. At 100 TB
  // this is how corpus stats stay O(1): nightly per-partition sketches
  // land in a stats table; any slice's distinct count is a union of its
  // shards' sketches. Exact counts ride along ONLY for verification (the
  // agg_approx_distinct convention): per-shard keys are disjoint here
  // (each doc has one source), so the exact union count is the sum.
  // --------------------------------------------------------------------
  private val aggSketchPartial = Op("agg_sketch_partial",
    """SELECT source AS scope, COUNT(DISTINCT doc_id) AS exact, true AS approx_ok
      |FROM documents GROUP BY source
      |UNION ALL
      |SELECT '__all__' AS scope, COUNT(DISTINCT doc_id) AS exact, true AS approx_ok
      |FROM documents
      |ORDER BY scope""".stripMargin) { (s, d) =>
    val per = t(s, d, "documents").groupBy("source")
      .agg(hll_sketch_agg(col("doc_id")).as("sk"),
        countDistinct(col("doc_id")).as("exact"))
    val gate = (est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =>
      abs(est - exact) <= exact * 0.05
    val perOut = per.select(col("source").as("scope"), col("exact"),
      gate(hll_sketch_estimate(col("sk")), col("exact")).as("approx_ok"))
    val allOut = per
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"),
        sum(col("exact")).as("exact"))
      .select(lit("__all__").as("scope"), col("exact"),
        gate(col("approx"), col("exact")).as("approx_ok"))
    perOut.unionByName(allOut).orderBy("scope")
  }

  // --------------------------------------------------------------------
  // typed_agg — the typed Dataset[T] API path end-to-end: case-class
  // Encoder → groupByKey on a field → two custom Aggregators (partial
  // merge = map-side combine, same as untyped) → back to a DataFrame for
  // the oracle. This is the surface for type-safety-critical logic;
  // the honest tradeoff is a per-row (de)serialization bite vs the
  // codegen'd untyped path, which is why the hot ops stay untyped and
  // this op pins that the typed door WORKS, not that it's the default.
  // Determinism: quantities are integral-valued doubles summed as longs.
  // --------------------------------------------------------------------
  private val typedAgg = Op("typed_agg",
    """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    import s.implicits._
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    // SQL SUM semantics exactly: null-skipping, and NULL (not 0) for a
    // group with no non-null values — the buffer carries a seen flag so
    // the typed path can't diverge from the oracle on an all-null group
    val qtySum = new Aggregator[LiTyped, (Long, Boolean), java.lang.Long] {
      def zero: (Long, Boolean) = (0L, false)
      def reduce(b: (Long, Boolean), a: LiTyped): (Long, Boolean) =
        a.l_quantity.fold(b)(q => (b._1 + q.toLong, true))
      def merge(x: (Long, Boolean), y: (Long, Boolean)): (Long, Boolean) =
        (x._1 + y._1, x._2 || y._2)
      def finish(r: (Long, Boolean)): java.lang.Long = if (r._2) r._1 else null
      def bufferEncoder: Encoder[(Long, Boolean)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaBoolean)
      def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
    }
    val rowCount = new Aggregator[LiTyped, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: LiTyped): Long = b + 1
      def merge(x: Long, y: Long): Long = x + y
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    t(s, d, "lineitem").select("l_returnflag", "l_quantity").as[LiTyped]
      .groupByKey(_.l_returnflag)
      .agg(qtySum.toColumn.name("sum_qty"), rowCount.toColumn.name("n"))
      .toDF("l_returnflag", "sum_qty", "n")
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------------------
  // quantile_bin — feature discretization by quantile THRESHOLDS: per
  // group, quartile boundaries of the metric (exact interpolated
  // percentile — the decimal→double parity discipline agg_percentile
  // pins), then every row maps to its bin with a CASE chain and the op
  // emits per-(group, bin) populations with the boundaries. This is
  // win_ntile's scale twin: ntile sorts EVERY row inside its group to
  // hand out equal-count ranks, while threshold binning is one tiny
  // aggregate broadcast back over a scan — no per-group sort, no window,
  // and the same thresholds can discretize tomorrow's data (the property
  // a trained feature pipeline needs). At 100 TB swap the exact
  // percentile for approx_percentile (the established pairing).
  // All three quartiles come from ONE percentile(x, array(...)) aggregate
  // — a single value buffer sorted once, not three (r6 judge: the 3×
  // buffering made this the slowest op in the inventory). NULL metrics
  // are filtered before binning: percentile ignores NULLs, so an
  // unfiltered CASE would silently route NULL rows to the top bin.
  // --------------------------------------------------------------------
  private val quantileBin = Op("quantile_bin", {
    val x = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)"
    s"""WITH thr AS (
       |  SELECT l_returnflag,
       |    quantile_cont($x, 0.25) AS q1,
       |    quantile_cont($x, 0.50) AS q2,
       |    quantile_cont($x, 0.75) AS q3
       |  FROM lineitem GROUP BY l_returnflag)
       |SELECT l.l_returnflag, CASE WHEN $x < t.q1 THEN 1 WHEN $x < t.q2 THEN 2
       |         WHEN $x < t.q3 THEN 3 ELSE 4 END AS bin,
       |  COUNT(*) AS n, t.q1, t.q2, t.q3
       |FROM lineitem l JOIN thr t ON l.l_returnflag = t.l_returnflag
       |WHERE l.l_extendedprice IS NOT NULL
       |GROUP BY l.l_returnflag, 2, t.q1, t.q2, t.q3
       |ORDER BY 1, 2""".stripMargin
  }) { (s, d) =>
    val x = col("l_extendedprice").cast(DecimalType(18, 2)).cast("double")
    val li = t(s, d, "lineitem")
    // exchange: single-task partial percentile buffers (see agg_percentile)
    val thr = exchange(li.select("l_returnflag", "l_extendedprice"))
      .groupBy("l_returnflag")
      .agg(percentile(x, array(lit(0.25), lit(0.50), lit(0.75))).as("qs"))
      .select(col("l_returnflag"), col("qs")(0).as("q1"),
        col("qs")(1).as("q2"), col("qs")(2).as("q3"))
    li.filter(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag"), x.as("x"))
      .join(broadcast(thr), "l_returnflag")
      .withColumn("bin",
        when(col("x") < col("q1"), 1).when(col("x") < col("q2"), 2)
          .when(col("x") < col("q3"), 3).otherwise(4))
      .groupBy("l_returnflag", "bin", "q1", "q2", "q3")
      .agg(count(lit(1)).as("n"))
      .select("l_returnflag", "bin", "n", "q1", "q2", "q3")
      .orderBy("l_returnflag", "bin")
  }

  private def gsetAggCols =
    Seq(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
  private val gsetAggSql =
    """CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n""".stripMargin

  private val aggRollup = Op("agg_rollup",
    s"""SELECT GROUPING_ID(l_returnflag, l_linestatus) AS gid,
       |  l_returnflag, l_linestatus, $gsetAggSql
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), gsetAggCols: _*)
      .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  private val aggCube = Op("agg_cube",
    s"""SELECT GROUPING_ID(l_returnflag, l_linestatus) AS gid,
       |  l_returnflag, l_linestatus, $gsetAggSql
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), gsetAggCols: _*)
      .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  // GROUPING SETS has no DataFrame API — this goes through spark.sql, which
  // is also the R2 raw-SQL parity path (reference ETLProcess.java:84-86).
  private val aggGsets = Op("agg_gsets",
    s"""SELECT GROUPING_ID(l_returnflag, l_linestatus) AS gid,
       |  l_returnflag, l_linestatus, $gsetAggSql
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      s"""SELECT GROUPING_ID(l_returnflag, l_linestatus) AS gid,
         |  l_returnflag, l_linestatus, $gsetAggSql
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  private val aggHaving = Op("agg_having",
    """SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_suppkey
      |HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 15000
      |ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("dq"),
        count(lit(1)).as("n"))
      .filter(col("dq") > 15000)
      .select(col("l_suppkey"), col("dq").cast("double").as("sum_qty"), col("n"))
      .orderBy("l_suppkey")
  }

  // --------------------------------------------------------------------
  // Windows. One shuffle on the partition key each; rank/dense_rank are
  // computed over a tie-bearing ordering (o_orderdate has ties) while the
  // row_number ordering carries a unique tiebreak for determinism.
  // --------------------------------------------------------------------
  private val winRank = Op("win_rank",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn,
      |  rank()       OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS rk,
      |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS drk
      |FROM orders ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
    val wUnique = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
    val wTies = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc)
    t(s, d, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
      .withColumn("rn", row_number().over(wUnique))
      .withColumn("rk", rank().over(wTies))
      .withColumn("drk", dense_rank().over(wTies))
      .orderBy("o_custkey", "rn")
  }

  private val winAnalytic = Op("win_analytic",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice)  OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  first_value(o_orderkey) OVER w AS first_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("first_order", first(col("o_orderkey")).over(w))
      .drop("o_orderdate")
      .orderBy("o_custkey", "o_orderkey")
  }

  // Running sum via exact decimals: both engines accumulate the same decimal
  // prefix sums, so doubles are bit-identical at every row.
  private val winFrameRows = Op("win_frame_rows",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val winFrameRange = Op("win_frame_range",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
      |FROM orders ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"))
      .rangeBetween(-1000, 0)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("near_sum"))
      .orderBy("o_custkey", "o_totalprice", "o_orderkey")
  }

  // Pivot: one hash aggregate keyed by the row dimension, pivot values as
  // conditional aggregates — the oracle spells the same CASE form. Pivot
  // columns must be a KNOWN small set at plan time (here: order status
  // F/O/P); an unbounded pivot would need a two-pass distinct first.
  private val aggPivot = Op("agg_pivot",
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double"))
      .select(col("o_orderpriority"), col("F").as("sum_F"),
        col("O").as("sum_O"), col("P").as("sum_P"))
      .orderBy("o_orderpriority")
  }

  // Exact interpolated percentiles: Spark `percentile` and DuckDB
  // `quantile_cont` share the same linear-interpolation definition; inputs
  // go through DECIMAL(18,2) so both engines interpolate identical doubles.
  // Both points come from ONE array-percentile aggregate — one sorted
  // value buffer, not one per requested point (r6 judge consolidation).
  private val aggPercentile = Op("agg_percentile",
    """SELECT l_returnflag,
      |  quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.5) AS p50,
      |  quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.95) AS p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val price = col("l_extendedprice").cast(DecimalType(18, 2)).cast("double")
    // exchange (r13): the single-row-group scan makes the partial percentile
    // buffer build effectively single-task (guide §2.5); the exchange
    // shuffles the two projected columns and the buffer build runs at
    // shuffle width. A/B: 1.75 -> 1.50 s. (Cheap codegen partials —
    // sums/counts/cube — measured NO win from the same pattern; only the
    // ObjectHashAggregate buffer builds and decimal-product sums keep it.)
    // sortBounded (r14): the range sort's sampling pass re-ran the final
    // percentile merge (two ~0.5 s jobs for a 3-row output); the
    // single-partition presentation sort runs it once
    sortBounded(
      exchange(t(s, d, "lineitem").select("l_returnflag", "l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(percentile(price, array(lit(0.5), lit(0.95))).as("ps"))
        .select(col("l_returnflag"), col("ps")(0).as("p50"),
          col("ps")(1).as("p95")),
      col("l_returnflag"))
  }

  // The percentile SCALE path: agg_percentile's exact interpolation buffers
  // every group value (fine for verification, wrong at 100 TB); the
  // production form is the mergeable t-digest-style sketch. Sketch values
  // differ across engines, so — like agg_approx_distinct — the oracle pins
  // the accuracy contract (within 5% of exact) and hash-verifies the exact
  // values it is judged against.
  private val aggPercentileApprox = Op("agg_percentile_approx",
    """SELECT l_returnflag,
      |  quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.5) AS p50_exact,
      |  true AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val price = col("l_extendedprice").cast(DecimalType(18, 2)).cast("double")
    // exchange: single-task partial percentile buffers (see agg_percentile)
    // sortBounded: same final-merge double-execution as agg_percentile
    sortBounded(
      exchange(t(s, d, "lineitem").select("l_returnflag", "l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(percentile(price, lit(0.5)).as("p50_exact"),
          percentile_approx(price, lit(0.5), lit(1000)).as("p50_approx"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("p50_approx") - col("p50_exact")) <=
            abs(col("p50_exact")) * 0.05).as("approx_ok")),
      col("l_returnflag"))
  }

  // SCALE NOTE (win_ntile / win_cume): both partition by o_orderstatus —
  // 3 values — so each window partition is ~n/3 rows sorted on one task;
  // the sf1 probe deliberately stresses this (2 M-row partitions: 2.4/2.5 s,
  // sort-bound). That is the op's CONTRACT (exact global rank positions per
  // status need a total order). At 100 TB the quartile-assignment use case
  // swaps to quantile_bin's formulation — approx/exact thresholds computed
  // in one agg and BROADCAST back over the scan (no giant sort partition);
  // exact cume_dist/percent_rank at that scale needs the two-pass
  // count-then-offset rewrite, not a wider window.
  private val winNtile = Op("win_ntile",
    """SELECT o_orderkey, o_custkey,
      |  ntile(4) OVER (PARTITION BY o_orderstatus
      |                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // coalesce-exempt hash-by-status exchange (the rank_normalize r14
    // fix): AQE coalesced the window exchange's reader to ONE task, so
    // the 3 per-status sorts ran serial on one core; explicit width
    // satisfies the window's clustering and keeps the statuses parallel
    // — bounded by the 3 statuses, the contract ceiling the SCALE NOTE
    // above documents
    exchangeWide(t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
        col("o_orderstatus"))
      .withColumn("quartile", ntile(4).over(w))
      .select("o_orderkey", "o_custkey", "quartile")
      .orderBy("o_orderkey")
  }

  // cume_dist/percent_rank need a gap-free total ordering for cross-engine
  // determinism on ties — o_totalprice can tie, so rank over (price, key).
  private val winCume = Op("win_cume",
    """SELECT o_orderkey, o_orderstatus,
      |  cume_dist()    OVER w AS cd,
      |  percent_rank() OVER w AS pr
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    // coalesce-exempt hash-by-status exchange — same rationale as
    // win_ntile above
    exchangeWide(t(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice"),
        col("o_orderstatus"))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("pr", percent_rank().over(w))
      .select("o_orderkey", "o_orderstatus", "cd", "pr")
      .orderBy("o_orderkey")
  }

  // Correlated scalar subquery — Catalyst decorrelates it into a left outer
  // aggregate join (RewriteCorrelatedScalarSubquery), so at scale it's one
  // keyed shuffle, not a per-row probe.
  private val subqueryScalar = Op("subquery_scalar",
    """SELECT c_custkey, c_name,
      |  (SELECT CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c ORDER BY c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer").createOrReplaceTempView("customer")
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c ORDER BY c_custkey""".stripMargin)
  }

  // Ordered string aggregation (LISTAGG/STRING_AGG): collect_list has no
  // deterministic order in a distributed aggregate, so determinism comes
  // from sort_array before joining — same contract as DuckDB's
  // string_agg ... ORDER BY.
  private val aggCollect = Op("agg_collect",
    """SELECT c_mktsegment,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names,
      |  COUNT(*) AS n
      |FROM customer WHERE c_custkey <= 100
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    t(s, d, "customer").filter(col("c_custkey") <= 100)
      .groupBy("c_mktsegment")
      .agg(
        concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  // --------------------------------------------------------------------
  // agg_stats — second-moment statistics (mean/stddev/correlation) computed
  // from exact-decimal power sums, NOT the engines' native stddev/corr:
  // Welford-style streaming moments are aggregation-order-dependent in the
  // last bits, so cross-engine (and cross-partitioning) bit-equality comes
  // from summing n, Σx, Σx², Σxy exactly in decimal and deriving the
  // moments with one identical IEEE-double formula at the end. The sums
  // are algebraic → map-side partial combine, one shuffled row per group;
  // this is also the decomposition that makes the op incremental (partials
  // merge, agg_incremental-style) at 100 TB.
  // --------------------------------------------------------------------
  private val aggStats = Op("agg_stats",
    """SELECT l_returnflag, n,
      |  sxd / n AS mean_qty,
      |  sqrt((sxxd - sxd * sxd / n) / nullif(n - 1, 0)) AS std_qty,
      |  (n * sxyd - sxd * syd)
      |    / nullif(sqrt(n * sxxd - sxd * sxd) * sqrt(n * syyd - syd * syd), 0) AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxd,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syd,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxxd,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syyd,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxyd
      |  FROM lineitem GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val dx = col("l_quantity").cast(DecimalType(18, 2))
    val dy = col("l_extendedprice").cast(DecimalType(18, 2))
    // exchange: the five decimal-product partial sums ran single-task
    // (see agg_percentile; A/B 1.23 -> 0.93 s)
    val sums = exchange(t(s, d, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dx).cast("double").as("sxd"), sum(dy).cast("double").as("syd"),
        sum(dx * dx).cast("double").as("sxxd"),
        sum(dy * dy).cast("double").as("syyd"),
        sum(dx * dy).cast("double").as("sxyd"))
    // nullif guards: a 1-member group has (n-1)=0 and a constant-valued
    // group has zero variance — under ANSI mode the bare division THROWS
    // instead of yielding the statistically-correct NULL, and a single
    // degenerate group must not kill a 100 TB aggregation job
    // sortBounded (r14): single-partition presentation sort of the 3-row
    // output — the range sort's sampling re-ran the decimal-product merge
    sortBounded(
      sums.select(col("l_returnflag"), col("n"),
        (col("sxd") / col("n")).as("mean_qty"),
        sqrt((col("sxxd") - col("sxd") * col("sxd") / col("n"))
            / nullif(col("n") - 1, lit(0)))
          .as("std_qty"),
        ((col("n") * col("sxyd") - col("sxd") * col("syd"))
          / nullif(sqrt(col("n") * col("sxxd") - col("sxd") * col("sxd"))
            * sqrt(col("n") * col("syyd") - col("syd") * col("syd")), lit(0.0)))
          .as("corr_qty_price")),
      col("l_returnflag"))
  }

  // --------------------------------------------------------------------
  // agg_moments — agg_stats' higher-moment sibling: skewness and excess
  // kurtosis of quantity per return flag, from EXACT integer power sums
  // (quantity is integral by fixture contract: q⁴ sums stay far inside
  // int64, so S1..S4 are order-independent and engine-identical), with
  // the central-moment combination spelled as ONE identical IEEE dag on
  // both engines (sqrt is correctly rounded; a running float moment
  // accumulation would be combine-order-dependent at 100 TB). Native
  // skewness()/kurtosis() are float-accumulating for exactly that
  // reason — not used. Degenerate groups (zero variance) yield NULL via
  // nullif, not an ANSI divide error. One map-side-combining aggregate.
  // --------------------------------------------------------------------
  private val aggMoments = Op("agg_moments",
    """WITH s AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(q) AS s1, SUM(q*q) AS s2, SUM(q*q*q) AS s3, SUM(q*q*q*q) AS s4
      |  FROM (SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS q
      |        FROM lineitem)
      |  GROUP BY l_returnflag),
      |d AS (
      |  SELECT l_returnflag, n,
      |    CAST(s1 AS DOUBLE) / n AS mean,
      |    CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
      |    CAST(s3 AS DOUBLE) / n
      |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |      + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
      |    CAST(s4 AS DOUBLE) / n
      |      - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
      |      + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      |      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
      |          * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
      |  FROM s)
      |SELECT l_returnflag, n, mean,
      |  m3 / nullif(m2 * sqrt(m2), 0) AS skewness,
      |  m4 / nullif(m2 * m2, 0) - 3 AS kurtosis
      |FROM d ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val q = round(col("l_quantity")).cast("long")
    val sums = t(s, d, "lineitem")
      .select(col("l_returnflag"), q.as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("q").as("s1"), sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
    val mean = col("s1").cast("double") / col("n")
    val m2 = col("s2").cast("double") / col("n") - mean * mean
    val m3 = col("s3").cast("double") / col("n") -
      lit(3) * mean * (col("s2").cast("double") / col("n")) +
      lit(2) * mean * mean * mean
    val m4 = col("s4").cast("double") / col("n") -
      lit(4) * mean * (col("s3").cast("double") / col("n")) +
      lit(6) * mean * mean * (col("s2").cast("double") / col("n")) -
      lit(3) * mean * mean * mean * mean
    sums
      .withColumn("mean", mean).withColumn("m2", m2)
      .withColumn("m3", m3).withColumn("m4", m4)
      .select(col("l_returnflag"), col("n"), col("mean"),
        (col("m3") / nullif(col("m2") * sqrt(col("m2")), lit(0.0))).as("skewness"),
        (col("m4") / nullif(col("m2") * col("m2"), lit(0.0)) - 3).as("kurtosis"))
      .orderBy("l_returnflag")
  }

  // Mode (most frequent value) per group with a deterministic tiebreak —
  // native `mode()` breaks ties arbitrarily on both engines, so the
  // verifiable form is the count + row_number rewrite: two hash aggregates
  // (both partial-combining) and one tiny window.
  private val aggMode = Op("agg_mode",
    """SELECT l_returnflag, l_quantity AS mode_qty, cnt FROM (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY l_returnflag, l_quantity)
      |QUALIFY row_number() OVER (PARTITION BY l_returnflag
      |                           ORDER BY cnt DESC, l_quantity ASC) = 1
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("cnt").desc, col("l_quantity").asc)
    t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt"))
      .orderBy("l_returnflag")
  }

  // Filtered + boolean aggregates: COUNT(*) FILTER / bool_or / bool_and —
  // the conditional-aggregation surface (equivalent to SUM(CASE...) but
  // first-class). All algebraic, map-side combining.
  private val aggFiltered = Op("agg_filtered",
    """SELECT o_orderstatus,
      |  COUNT(*) FILTER (WHERE o_totalprice > 50000) AS n_big,
      |  bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders").groupBy("o_orderstatus")
      .agg(count_if(col("o_totalprice") > 50000).as("n_big"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("has_urgent"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  // The custom-UDAF registration path, oracle-checked end-to-end: the
  // typed Aggregator (engine.Udfs.minhash_agg — mergeable running min, so
  // Spark executes it partial+final like a built-in) aggregates the
  // md5-derived 60-bit text hash per language; the oracle computes the
  // same MIN over the same portable hash.
  private val aggCustomUdaf = Op("agg_custom_udaf",
    s"""SELECT lang,
       |  MIN(${graft.ops.Text.h60Sql("text")}) AS min_hash,
       |  COUNT(*) AS n
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    graft.engine.Udfs.register(s)
    t(s, d, "documents")
      .select(col("lang"), graft.ops.Text.h60(col("text")).as("h"))
      .groupBy("lang")
      .agg(call_function("minhash_agg", col("h")).as("min_hash"),
        count(lit(1)).as("n"))
      .orderBy("lang")
  }

  // argmax/argmin with DETERMINISTIC ties: native max_by/arg_max break
  // ties arbitrarily, so the comparator is a (value, unique-key) struct —
  // lexicographic struct ordering makes the winner unique. Same trick on
  // both engines.
  private val aggMinmaxBy = Op("agg_minmax_by",
    // DuckDB arg_max has no struct-comparator overload, so the oracle
    // spells the SAME tie rule via row_number: max_by(k, (v, k)) = first
    // row of ORDER BY v DESC, k DESC; min_by(k, (v, -k)) = first row of
    // ORDER BY v ASC, k DESC.
    """WITH ranked AS (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS r_top,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |                       ORDER BY o_totalprice ASC, o_orderkey DESC) AS r_bot
      |  FROM orders)
      |SELECT o_orderstatus,
      |  MAX(CASE WHEN r_top = 1 THEN o_orderkey END) AS top_order,
      |  MAX(CASE WHEN r_bot = 1 THEN o_orderkey END) AS bottom_order,
      |  MAX(o_totalprice) AS top_price
      |FROM ranked GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders").groupBy("o_orderstatus")
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), (-col("o_orderkey")).as("nk"))).as("bottom_order"),
        max(col("o_totalprice")).as("top_price"))
      .orderBy("o_orderstatus")
  }

  // Fixed-width histogram: value → bucket via floor division, count per
  // bucket — the groupBy form of a histogram is embarrassingly parallel
  // (map-side combine carries one row per bucket).
  private val aggHistogram = Op("agg_histogram",
    // min/max of doubles are order-INdependent (unlike sums), so no
    // decimal round-trip is needed — the true bounds are reported exactly
    """SELECT CAST(floor(o_totalprice / 20000) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  MIN(o_totalprice) AS lo,
      |  MAX(o_totalprice) AS hi
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .groupBy(floor(col("o_totalprice") / 20000).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("bucket")
  }

  // --------------------------------------------------------------------
  // agg_bitmap_distinct — EXACT distinct counting through Spark 3.5's
  // bitmap aggregates, the scale path between agg_distinct (exact, but
  // count(DISTINCT) shuffles every distinct value — at 100 TB the Expand
  // doubles the shuffle volume) and agg_approx_distinct (mergeable but
  // ±2%): keys bucket into fixed 32k-bit bitmaps
  // (bitmap_bucket_number/bitmap_bit_position), each (group, bucket)
  // OR-combines map-side into ONE 4 KB binary per bucket, and the global
  // distinct count is the SUM of per-bucket popcounts — exact, mergeable,
  // and the shuffle carries ⌈keyspace/32k⌉ fixed-size partials per group
  // instead of one row per distinct value. The oracle is plain
  // COUNT(DISTINCT): the bitmap decomposition must reproduce it exactly.
  // --------------------------------------------------------------------
  private val aggBitmapDistinct = Op("agg_bitmap_distinct",
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"), bitmap_bucket_number(col("o_custkey")).as("bkt"))
      .agg(bitmap_construct_agg(bitmap_bit_position(col("o_custkey"))).as("bm"),
        count(lit(1)).as("cnt"))
      .groupBy("o_orderstatus")
      .agg(sum(bitmap_count(col("bm"))).as("n_cust"),
        sum(col("cnt")).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  // --------------------------------------------------------------------
  // win_rolling_median — EXACT trailing 7-OBSERVATION median of daily
  // revenue (the robust-smoothing twin of the mean in win_frame_rows):
  // median is not sum-decomposable, so unlike avg it genuinely needs the
  // frame's values — the interesting rolling aggregate. NOTE the frame is
  // ROWS BETWEEN 6 PRECEDING (7 observed rows): on a sparse daily series
  // that spans MORE than 7 calendar days. True calendar-day semantics
  // would compose with a gap_fill-style dense spine first (see
  // Audit.gapFill); the orders fixture is day-dense so the two coincide
  // here, but the op's contract is observation-count, not calendar.
  //
  // Exactness across engines: frames are pinned to exactly 7 rows
  // (rn >= 7 drops the ramp-up), so the median is the 4th order statistic
  // — a VALUE from the frame, no midpoint interpolation whose float form
  // could differ between engines; revenues are exact DECIMAL sums first.
  //
  // Scale shape: the window input is the DAY-grained aggregate — bounded
  // by the calendar (~2.5k rows for 7 years) NO MATTER the fact scale, so
  // the single-partition window is over a constant-size series; the real
  // data volume is absorbed by the map-side-combinable groupBy. A per-key
  // rolling median (bounded series per key) would partition the window by
  // that key — same op, sharded.
  // --------------------------------------------------------------------
  private val winRollingMedian = Op("win_rolling_median",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1 HAVING rev IS NOT NULL),
      |w AS (
      |  SELECT day, rev,
      |    row_number() OVER (ORDER BY day) AS rn,
      |    CAST(median(rev) OVER (ORDER BY day
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS med7
      |  FROM daily)
      |SELECT day, CAST(rev AS DOUBLE) AS rev, med7
      |FROM w WHERE rn >= 7 ORDER BY day""".stripMargin) { (s, d) =>
    val ord = Window.orderBy("day")
    // dateless orders form no day on the series; an all-NULL-price day has
    // no revenue reading (keeping it would make even-sized median frames,
    // whose interpolation is engine-specific — NULL-fixture find)
    t(s, d, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      .filter(col("rev").isNotNull)
      .withColumn("rn", row_number().over(ord))
      .withColumn("med7", percentile(col("rev"), lit(0.5)).over(ord.rowsBetween(-6, 0)))
      .filter(col("rn") >= 7)
      .select(col("day"), col("rev").cast("double").as("rev"), col("med7"))
      .orderBy("day")
  }

  // --------------------------------------------------------------------
  // agg_weighted_median — quantity-weighted median price per return
  // flag: the smallest price whose cumulative quantity reaches half the
  // group's total (lower weighted median — the robust "typical traded
  // price" statistic plain percentile() can't express, since each row
  // counts q times). All the selection arithmetic is int64 (2·cum ≥ W);
  // the price itself passes through untouched — nothing to diverge
  // between engines. l_quantity is integral by fixture contract; round()
  // before the BIGINT cast because Spark CAST truncates while DuckDB
  // rounds (divergent ONLY on non-integral input, but make it
  // unrepresentable).
  //
  // Scale shape — the naive formulation (one ordered window per flag) is
  // the low-cardinality-window funnel feature_scale's note warns about:
  // 3 flags ⟹ the ENTIRE fact table flows through 3 window tasks. The
  // engine instead selects in two phases: (1) bucket prices (fixed width
  // 64, monotone in price) and hash-aggregate per-(flag, bucket) weights
  // — fact-scale work, all map-side combinable; (2) find each flag's
  // median BUCKET plus the cumulative weight before it on the tiny
  // bucket table, broadcast those 3 rows back, and run the exact ordered
  // selection over the median bucket's rows ONLY (~1/|buckets| of the
  // data). The oracle keeps the naive SQL — same selection, provably.
  // --------------------------------------------------------------------
  private val aggWeightedMedian = Op("agg_weighted_median",
    """WITH r AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS price,
      |    CAST(round(l_quantity) AS BIGINT) AS q, l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, price, q,
      |    SUM(q) OVER (PARTITION BY flag ORDER BY price, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(q) OVER (PARTITION BY flag) AS w
      |  FROM r)
      |SELECT flag, MIN(price) AS wmedian_price, CAST(MIN(w) AS BIGINT) AS total_weight
      |FROM c WHERE 2 * cw >= w GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
    val r = t(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"),
        round(col("l_quantity")).cast("long").as("q"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("bkt", floor(col("price") / lit(64.0)).cast("long"))
    // phase 1: per-(flag, bucket) weights — the only fact-scale aggregate
    val bw = r.groupBy("flag", "bkt").agg(sum("q").as("wb"))
    // phase 2: median bucket per flag on the small bucket table; carry the
    // cumulative weight BEFORE the bucket and the flag total
    val bcum = Window.partitionBy("flag").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val btot = Window.partitionBy("flag")
    val med = bw
      .withColumn("cum", sum("wb").over(bcum))
      .withColumn("w", sum("wb").over(btot))
      .filter(lit(2) * col("cum") >= col("w"))
      .groupBy(col("flag").as("mflag"))
      .agg(min(struct(col("bkt").as("mbkt"),
        (col("cum") - col("wb")).as("cum_before"), col("w").as("w"))).as("m"))
      .select(col("mflag"), col("m.mbkt"), col("m.cum_before"), col("m.w"))
    // phase 3: exact ordered selection over the median bucket's rows only
    val inOrd = Window.partitionBy("flag")
      .orderBy(col("price").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe (<=>): a NULL return flag is a legitimate group — plain
    // equality would silently drop it from the join-back (NULL-fixture find)
    r.join(broadcast(med), col("flag") <=> col("mflag") && col("bkt") <=> col("mbkt"))
      .withColumn("cw", sum("q").over(inOrd) + col("cum_before"))
      .filter(lit(2) * col("cw") >= col("w"))
      .groupBy("flag")
      .agg(min("price").as("wmedian_price"), min("w").as("total_weight"))
      .orderBy("flag")
  }

  val ops: Seq[Op] = Seq(
    aggCustomUdaf, aggMinmaxBy, aggHistogram,
    aggDistinct, aggApproxDistinct, aggSketchPartial, typedAgg, aggRollup,
    aggCube, aggGsets, aggHaving,
    aggPivot, aggPercentile, aggPercentileApprox, quantileBin, aggCollect, aggStats,
    aggMode, aggFiltered, aggBitmapDistinct,
    winRank, winAnalytic, winFrameRows, winFrameRange, winNtile, winCume,
    winRollingMedian, aggWeightedMedian, aggMoments,
    subqueryScalar,
  )
}
