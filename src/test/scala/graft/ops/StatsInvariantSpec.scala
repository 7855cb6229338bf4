package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic invariants of the round-10 statistical/sketch/graph additions,
  * recomputed from first principles (the AnalyticsSpec discipline: the
  * DuckDB twin proves engine AGREEMENT; these prove the CONTRACT — two
  * engines sharing a formulation can be consistently wrong together).
  */
class StatsInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("heavy_hitters: the count-min estimate is ONE-SIDED (est >= exact, always)") {
    val rows = SparkEntry.queries("heavy_hitters")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val est = r.getLong(r.fieldIndex("est_n"))
      val exact = r.getLong(r.fieldIndex("exact_n"))
      val over = r.getLong(r.fieldIndex("overcount"))
      withClue(s"token ${r.getString(0)}: ") {
        est should be >= exact // CMS never undercounts
        over shouldBe est - exact
      }
    }
  }

  test("heavy_hitters: every exact count matches a from-scratch token count") {
    val exact = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    SparkEntry.queries("heavy_hitters")(spark, dir).collect().foreach { r =>
      r.getLong(r.fieldIndex("exact_n")) shouldBe exact(r.getString(0))
    }
  }

  test("graph_pagerank: rank mass is conserved within the integer-truncation loss bound") {
    val rows = SparkEntry.queries("graph_pagerank")(spark, dir).collect()
    rows should not be empty
    val total = rows.map(_.getDouble(1)).sum
    // each of the 8 iterations loses < 1 unit (1e-15) per node to integer
    // truncation at the reset term, < 1 per edge-contribution div, and
    // < 1 at the damping div — with |V| nodes and degree <= 10, the loss
    // per iteration is < 12e-15 * |V|; mass can only shrink, never grow
    total should be <= 1.0 + 1e-12
    total should be > 0.99 // 8 rounds of ppm-scale truncation can't eat 1%
    // ranks are positive and the reset floor holds: r >= 0.15/N (truncated)
    rows.foreach(_.getDouble(1) should be > 0.0)
  }

  test("ab_ttest: the Welch statistic recomputes driver-side from the raw fixture") {
    val ev = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull
        && col("event_type").isin("click", "purchase"))
      .select(date_trunc("day", col("ts")).cast("timestamp").as("day"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    // exact moments via BigDecimal cents quantization (the op's contract)
    def cents(v: Double) =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val byDay = ev.groupBy(_._1)
    val rows = SparkEntry.queries("ab_ttest")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val day = r.getTimestamp(r.fieldIndex("day"))
      val g = byDay(day)
      def arm(t: String) = g.filter(_._2 == t).map(x => cents(x._3))
      val (a, b) = (arm("click"), arm("purchase"))
      val (na, nb) = (a.size.toLong, b.size.toLong)
      r.getLong(r.fieldIndex("n_a")) shouldBe na
      r.getLong(r.fieldIndex("n_b")) shouldBe nb
      def se2(xs: Seq[BigDecimal], n: Long) = {
        val sx = xs.sum.toDouble; val sxx = xs.map(x => x * x).sum.toDouble
        ((sxx - sx * sx / n) / (n - 1)) / n
      }
      val t = (a.sum.toDouble / na - b.sum.toDouble / nb) /
        math.sqrt(se2(a, na) + se2(b, nb))
      // recompute is the same IEEE tree, so exact equality is expected
      r.getDouble(r.fieldIndex("t_stat")) shouldBe t
    }
  }

  test("drift_report: TVD is in [0,1] and flags agree with the 0.1 gate") {
    val rows = SparkEntry.queries("drift_report")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val tvd = r.getDouble(r.fieldIndex("tvd"))
      tvd should be >= 0.0
      tvd should be <= 1.0
      r.getBoolean(r.fieldIndex("drifted")) shouldBe (tvd > 0.1)
      r.getDouble(r.fieldIndex("chi2")) should be >= 0.0
    }
  }

  test("conversion_latency: percentiles are nondecreasing and are observed latencies") {
    val rows = SparkEntry.queries("conversion_latency")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getLong(r.fieldIndex("p50_us")),
        r.getLong(r.fieldIndex("p90_us")), r.getLong(r.fieldIndex("p99_us")))
      p50 should be >= 0L
      p90 should be >= p50
      p99 should be >= p90
    }
  }

  test("dataset_card: the integer metrics recompute from the raw fixture") {
    val docs = Tables(spark, dir, "documents").collect()
    val card = SparkEntry.queries("dataset_card")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    card("n_docs") shouldBe docs.length.toLong
    card("n_null_text") shouldBe docs.count(r => r.isNullAt(r.fieldIndex("text"))).toLong
    val texts = docs.flatMap(r => Option(r.getAs[String]("text")))
    card("total_ws_tokens") shouldBe texts.map(_.split(" ", -1).length.toLong).sum
    card("exact_dup_docs") shouldBe texts.groupBy(identity).values
      .filter(_.length > 1).map(_.length.toLong).sum
    val lens = docs.flatMap(r => Option(r.getAs[Any]("n_chars")).map(_ => nLong(r, r.fieldIndex("n_chars"))))
    card("total_chars") shouldBe lens.sum
    card("max_chars") shouldBe (if (lens.isEmpty) 0L else lens.max)
  }
}
