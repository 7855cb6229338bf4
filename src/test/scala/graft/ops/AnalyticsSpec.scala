package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic properties of the round-8 analytics additions (skew profile,
  * DQ gate, mutual-kNN triangles, transition matrix, streaks): each op's
  * result is recomputed DRIVER-SIDE from first principles over the
  * collected fixture and compared exactly. The DuckDB twin proves engine
  * agreement; these prove the contract itself — the distinction that
  * caught graph_triangles' self-join misresolution (both engines can be
  * "consistently wrong" only when they share a formulation; a from-scratch
  * recompute shares nothing).
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  // Raw-fixture numerics are read with SparkSpec.nLong/nDouble (tolerant
  // of driver testdata type refreshes); engine outputs keep typed getters.

  test("skew_report: shares and ranks recompute from raw per-key counts") {
    val counts = Tables(spark, dir, "lineitem")
      .groupBy("l_suppkey").count().collect()
      .map(r => nLong(r, 0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(25)
    val rows = SparkEntry.queries("skew_report")(spark, dir).collect()
    rows.length shouldBe math.min(25, counts.size)
    var cum = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      val (key, cnt) = top(i)
      r.getLong(0) shouldBe key
      r.getLong(1) shouldBe cnt
      cum += cnt
      r.getLong(2) shouldBe cnt * 10000 / total
      r.getLong(3) shouldBe cum * 10000 / total
      r.getLong(4) shouldBe (i + 1).toLong
    }
  }

  test("dq_check: every rule's count recomputes from raw collected data") {
    val rows = SparkEntry.queries("dq_check")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .collect()
    val orders = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
    val custKeys = Tables(spark, dir, "customer")
      .select("c_custkey").collect().map(nLong(_, 0)).toSet
    rows shouldBe Map(
      "lineitem_qty_out_of_range" ->
        li.count(r => r.isNullAt(2) || nDouble(r, 2) < 1 || nDouble(r, 2) > 50).toLong,
      "lineitem_nonpositive_price" ->
        li.count(r => r.isNullAt(3) || nDouble(r, 3) <= 0).toLong,
      "lineitem_null_shipdate" -> li.count(_.isNullAt(4)).toLong,
      "lineitem_pk_duplicate" ->
        li.groupBy(r => (nLong(r, 0), nLong(r, 1))).count(_._2.length > 1).toLong,
      "orders_orphan_custkey" ->
        orders.count(r => !r.isNullAt(1) && !custKeys(nLong(r, 1))).toLong,
      "orders_null_orderdate" -> orders.count(_.isNullAt(2)).toLong,
      "orders_null_custkey" -> orders.count(_.isNullAt(1)).toLong)
    // the report is not vacuous: the fixture's lineitem genuinely lacks a
    // unique (l_orderkey, l_linenumber) key — the gate catches a real fact
    rows("lineitem_pk_duplicate") should be > 0L
  }

  test("graph_triangles: per-node counts equal a from-scratch driver recompute") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => (nLong(r, 0), nLong(r, 1)))
    // co-occurrence weights over unordered pairs
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    li.groupBy(_._1).foreach { case (_, rows) =>
      val sks = rows.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        w((sks(i), sks(j))) = w.getOrElse((sks(i), sks(j)), 0L) + 1
    }
    // per-node top-10 by (w desc, neighbor asc); edge kept iff mutual
    val dirEdges = w.toSeq.flatMap { case ((u, v), c) => Seq((u, v, c), (v, u, c)) }
    // .toSeq before flatMap: Map.flatMap over pair results rebuilds a MAP
    // (deduping by src — one neighbor per node instead of ten)
    val kept = dirEdges.groupBy(_._1).toSeq.flatMap { case (src, es) =>
      es.sortBy { case (_, dst, c) => (-c, dst) }.take(10).map(e => (src, e._2))
    }.toSet
    val edges = w.keys.filter { case (u, v) => kept((u, v)) && kept((v, u)) }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
    for ((a, b) <- edges; c <- adj.getOrElse(b, Set.empty)
         if adj.getOrElse(a, Set.empty).contains(c))
      Seq(a, b, c).foreach(n => triCount(n) = triCount.getOrElse(n, 0L) + 1)
    val got = SparkEntry.queries("graph_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe triCount.toMap
    got should not be empty
  }

  test("event_markov: transition counts recompute and rows sum to n_events - n_users") {
    val ev = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (nLong(r, 0), r.getAs[Any](1), nLong(r, 2), r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (epochUs(e._2), e._3)).map(_._4)
      ordered.zip(ordered.tail).foreach(p =>
        trans(p) = trans.getOrElse(p, 0L) + 1)
    }
    val rows = SparkEntry.queries("event_markov")(spark, dir).collect()
    rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap shouldBe trans.toMap
    val byFrom = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    rows.foreach { r =>
      r.getLong(3) shouldBe r.getLong(2) * 10000 / byFrom(r.getString(0))
    }
    // every non-final event transitions exactly once
    rows.map(_.getLong(2)).sum shouldBe
      (ev.length - ev.map(_._1).distinct.length)
  }

  test("gap_fill: complete spine, exact forward-fill, faithful provenance") {
    val present = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === 7 && col("o_orderpriority") === "1-URGENT")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("rev"))
      .collect()
      .map(r => r.getAs[java.sql.Date](0).toLocalDate ->
        r.getDecimal(1).doubleValue()).toMap
    val rows = SparkEntry.queries("gap_fill")(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate,
        r.getDouble(1), r.getBoolean(2)))
    // spine is the full closed calendar interval, in order, no dup days
    val days = rows.map(_._1)
    days.head shouldBe present.keys.minBy(_.toEpochDay)
    days.last shouldBe present.keys.maxBy(_.toEpochDay)
    days.zip(days.tail).foreach { case (a, b) =>
      b.toEpochDay shouldBe a.toEpochDay + 1
    }
    // each row carries the last observation at-or-before its day, and
    // was_missing is exactly "this day had no observation"
    var lastSeen = Double.NaN
    rows.foreach { case (day, ff, missing) =>
      missing shouldBe !present.contains(day)
      if (!missing) lastSeen = present(day)
      ff shouldBe lastSeen
    }
    rows.count(_._3) should be > 0 // the series is genuinely sparse
  }

  test("event_streak: longest consecutive-day run recomputes per user") {
    val days = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .map(r => (nLong(r, 0), r.getAs[java.sql.Date](1).toLocalDate))
    val expect = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).distinct.sortBy(_.toEpochDay)
      // split into runs of consecutive days, take (longest, earliest start)
      val runs = sorted.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc @ (run :: rest), d) if d.toEpochDay == run.head.toEpochDay + 1 =>
          (d :: run) :: rest
        case (acc, d) => List(d) :: acc
      }.map(r => (r.length.toLong, r.last)) // r is reversed: last = start
      u -> runs.minBy { case (len, start) => (-len, start.toEpochDay) }
    }
    val got = SparkEntry.queries("event_streak")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[java.sql.Date](2).toLocalDate))).toMap
    got shouldBe expect
    got.values.map(_._1).max should be >= 2L // streaks actually exist
  }

  test("time_ohlc: every bar recomputes from the raw event stream") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val raw = Tables(spark, dir, "events")
      .select("ts", "event_id", "event_type", "value").collect()
      .map(r => (epochUs(r.get(0)), nLong(r, 1), r.getString(2), nDouble(r, 3)))
    val expect = raw.groupBy { case (tus, _, ty, _) =>
      (java.time.Instant.ofEpochSecond(tus / 1000000).atOffset(java.time.ZoneOffset.UTC)
        .toLocalDate.toString, ty)
    }.map { case (k, evs) =>
      val byTime = evs.sortBy { case (tus, id, _, _) => (tus, id) }
      val vol = evs.map { case (_, _, _, v) =>
        new JBD(v).setScale(2, RoundingMode.HALF_UP) }
        .reduce(_ add _).doubleValue
      k -> ((byTime.head._4, evs.map(_._4).max, evs.map(_._4).min,
        byTime.last._4, evs.length.toLong, vol))
    }
    val got = SparkEntry.queries("time_ohlc")(spark, dir).collect()
      .map(r => (r.get(0).toString, r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))).toMap
    got shouldBe expect
    // bars are real aggregates, not passthrough rows
    got.values.exists(b => b._1 != b._4) shouldBe true // open != close somewhere
  }

  test("watermark_audit: the jittered-replay histogram recomputes per event") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = Tables(spark, dir, "events")
      .select("user_id", "event_id", "ts").collect()
      .map(r => (nLong(r, 0), nLong(r, 1), epochUs(r.get(2))))
    val lateness = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val arrival = evs.map { case (u, id, tus) =>
        (u, id, tus, tus + (h60(s"jit:$id") % 600) * 1000000L)
      }.sortBy { case (_, id, _, aus) => (aus, id) }
      arrival.zipWithIndex.map { case ((u, _, tus, _), i) =>
        val hwm = arrival.take(i).map(_._3).maxOption.getOrElse(Long.MinValue)
        (u, if (hwm <= tus) 0L else hwm - tus)
      }
    }
    def bucket(l: Long): String =
      if (l == 0) "0_on_time" else if (l < 60000000L) "1_lt_1m"
      else if (l < 300000000L) "2_lt_5m" else if (l < 3600000000L) "3_lt_1h"
      else "4_ge_1h"
    val expect = lateness.groupBy { case (_, l) => bucket(l) }
      .map { case (b, xs) => b -> ((xs.length.toLong, xs.map(_._1).distinct.length.toLong)) }
    val got = SparkEntry.queries("watermark_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expect
    // the transport model genuinely produces late data (the whole point)
    got.keySet.exists(_ != "0_on_time") shouldBe true
  }

  test("win_pareto: shares and ABC classes recompute from exact decimal revenue") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val natOf = Tables(spark, dir, "nation").collect()
      .map(r => nLong(r, 0) -> r.getString(1)).toMap
    val custNat = Tables(spark, dir, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => nLong(r, 0) -> natOf(nLong(r, 1))).toMap
    val rev = Tables(spark, dir, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (nLong(r, 0), new JBD(nDouble(r, 1)).setScale(2, RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (c, xs) => (custNat(c), c) -> xs.map(_._2).reduce(_ add _) }
    val expect = rev.groupBy(_._1._1).flatMap { case (nat, custs) =>
      val ordered = custs.toSeq.sortBy { case ((_, c), r) => (r.negate, c) }
      val tot = ordered.map(_._2).reduce(_ add _).doubleValue
      ordered.scanLeft(new JBD(0)) { case (cum, (_, r)) => cum add r }.tail
        .zip(ordered).map { case (cum, ((_, c), r)) =>
          val share = cum.doubleValue / tot
          (nat, c) -> ((r.doubleValue, share,
            if (share <= 0.80) "A" else if (share <= 0.95) "B" else "C"))
        }
    }
    val got = SparkEntry.queries("win_pareto")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getString(4)))).toMap
    got shouldBe expect
    // all three classes occur (the fixture revenue is Pareto-ish enough)
    got.values.map(_._3).toSet shouldBe Set("A", "B", "C")
  }

  test("interval_merge: islands recompute by a from-scratch sweep over each user's intervals") {
    val raw = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        get_json_object(col("props"), "$.k").cast("int").as("k")).collect()
      .map(r => (nLong(r, 0), nLong(r, 1), epochUs(r.get(2)), r.getInt(3)))
      .filter(_._4 >= 1) // zero-duration intervals dropped by contract
    val expect = raw.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val iv = evs.map { case (_, id, sus, k) => (sus, id, sus + k * 60000000L) }
        .sortBy { case (sus, id, _) => (sus, id) }
      // linear sweep: extend the island while start <= running max end
      val islands = iv.foldLeft(List.empty[(Long, Long, Long)]) { // (start, maxEnd, n)
        case ((s0, e0, n0) :: rest, (sus, _, eus)) if sus <= e0 =>
          (s0, math.max(e0, eus), n0 + 1) :: rest
        case (acc, (sus, _, eus)) => (sus, eus, 1L) :: acc
      }.reverse
      islands.zipWithIndex.map { case ((s0, e0, n0), i) =>
        (u, (i + 1).toLong) -> ((s0, e0, n0))
      }
    }.toMap
    val got = SparkEntry.queries("interval_merge")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    got shouldBe expect
    // merging actually merged: some island holds more than one interval
    got.values.exists(_._3 > 1) shouldBe true
  }

  test("rate_alert: baseline sums and alert flags recompute per calendar hour") {
    val raw = Tables(spark, dir, "events")
      .select("user_id", "ts").collect()
      .map(r => (nLong(r, 0), epochUs(r.get(1)) / 3600000000L))
    val counts = raw.groupBy(identity).map { case ((u, h), xs) => (u, h) -> xs.length.toLong }
    val expect = counts.map { case ((u, h), n) =>
      val window = (h - 24L) to (h - 1L)
      val present = window.flatMap(ph => counts.get((u, ph)))
      val prev = if (present.isEmpty) None else Some(present.sum)
      (u, h) -> ((n, prev.getOrElse(0L), prev.exists(p => 24 * n > 3 * p)))
    }
    val got = SparkEntry.queries("rate_alert")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    got shouldBe expect
    got.values.exists(_._3) shouldBe true // spikes exist in the fixture
  }

  test("win_ema: the dyadic trailing average recomputes from integer cents") {
    val raw = Tables(spark, dir, "events")
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (nLong(r, 0), nLong(r, 1), epochUs(r.get(2)), nDouble(r, 3)))
    val expect = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy { case (_, id, tus, _) => (tus, id) }
        .map { case (_, id, _, v) => (id, math.round(v * 100)) }
      ordered.zipWithIndex.map { case ((id, _), i) =>
        val window = ordered.slice(math.max(0, i - 7), i + 1).reverse // j=0 first
        val num = window.zipWithIndex.map { case ((_, c), j) => c * (1L << (7 - j)) }.sum
        val den = window.indices.map(j => (1L << (7 - j)) * 100).sum
        id -> num.toDouble / den.toDouble
      }
    }.toMap
    val got = SparkEntry.queries("win_ema")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    got shouldBe expect
  }

  test("rolling_active_users: DAU and trailing-7-day WAU recompute from raw user-days") {
    val ud = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .map(r => (nLong(r, 0), r.getAs[java.sql.Date](1).toLocalDate.toEpochDay))
    val byDay = ud.groupBy(_._2)
    val expect = byDay.map { case (d, xs) =>
      val wau = ud.collect { case (u, ad) if ad >= d - 6 && ad <= d => u }.distinct.length
      d -> ((xs.length.toLong, wau.toLong))
    }
    val got = SparkEntry.queries("rolling_active_users")(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date](0).toLocalDate.toEpochDay ->
        ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expect
    // WAU genuinely exceeds DAU somewhere (the window accumulates users)
    got.values.exists { case (dau, wau) => wau > dau } shouldBe true
  }

  test("join_asof_nearest: the bidirectional nearest match recomputes per event") {
    val all = Tables(spark, dir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value").collect()
      .map(r => (nLong(r, 0), nLong(r, 1), epochUs(r.get(2)), r.getString(3), nDouble(r, 4)))
    val orders = all.filter(_._4 == "purchase")
      .map { case (id, u, tus, _, v) => (u, tus, id, v) }
      .groupBy(r => (r._1, r._2)) // dedup (user, ts): keep max purchase id
      .map(_._2.maxBy(_._3)).toSeq.groupBy(_._1)
    val events = all.filter(_._4 == "error").map { case (id, u, tus, _, _) => (id, u, tus) }
    val expect = events.map { case (id, u, tus) =>
      val os = orders.getOrElse(u, Seq.empty)
      val back = os.filter(_._2 <= tus).sortBy(o => (o._2, o._3)).lastOption
      val fwd = os.filter(_._2 > tus).sortBy(o => (o._2, o._3)).headOption
      val pick = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (tus - b._2 <= f._2 - tus) Some((b, "back")) else Some((f, "fwd"))
        case (Some(b), None) => Some((b, "back"))
        case (None, Some(f)) => Some((f, "fwd"))
        case _ => None
      }
      id -> pick.map { case (o, dir0) => (o._3, o._4, dir0) }
    }.toMap
    val got = SparkEntry.queries("join_asof_nearest")(spark, dir).collect()
      .map { r =>
        val m = if (r.isNullAt(2)) None
          else Some((r.getLong(2), r.getDouble(3), r.getString(4)))
        r.getLong(0) -> m
      }.toMap
    got shouldBe expect
    // both directions genuinely occur
    got.values.flatten.map(_._3).toSet shouldBe Set("back", "fwd")
  }

  test("time_weighted_avg: the duration-weighted mean recomputes from integer cents and µs") {
    val raw = Tables(spark, dir, "events")
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (nLong(r, 0), nLong(r, 1), epochUs(r.get(2)), nDouble(r, 3)))
    val expect = raw.groupBy(_._1).flatMap { case (u, evs) =>
      val ordered = evs.sortBy { case (_, id, tus, _) => (tus, id) }
      val ivs = ordered.zip(ordered.tail).map { case ((_, _, t0, v), (_, _, t1, _)) =>
        (math.round(v * 100), t1 - t0)
      }
      if (ivs.isEmpty) None
      else {
        val tot = ivs.map(_._2).sum
        val wsum = ivs.map { case (c, dd) => BigDecimal(c) * BigDecimal(dd) }.sum
        val twa = if (tot == 0) None
          else Some(wsum.toDouble / tot.toDouble / 100)
        Some(u -> ((ivs.length.toLong, tot, twa)))
      }
    }
    val got = SparkEntry.queries("time_weighted_avg")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    got shouldBe expect
    got.values.forall(_._3.isDefined) shouldBe true // fixture has real durations
  }

  test("cohort_ltv: per-cohort revenue curve recomputes and is cumulative") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val weekUs = 604800000000L
    // Monday-start week truncation on epoch-µs (1970-01-01 was a Thursday
    // → shift by 3 days before flooring)
    def weekStart(tus: Long): Long = {
      val shift = 3L * 86400000000L
      ((tus + shift) / weekUs) * weekUs - shift
    }
    val raw = Tables(spark, dir, "events")
      .select("user_id", "ts", "value").collect()
      .map(r => (nLong(r, 0), epochUs(r.get(1)), nDouble(r, 2)))
    val firstWeek = raw.groupBy(_._1).map { case (u, evs) =>
      u -> evs.map(e => weekStart(e._2)).min
    }
    val rev = raw.groupBy { case (u, tus, _) =>
      (firstWeek(u), (weekStart(tus) - firstWeek(u)) / weekUs)
    }.map { case (k, evs) =>
      k -> evs.map(e => new JBD(e._3).setScale(2, RoundingMode.HALF_UP)).reduce(_ add _)
    }
    val expect = rev.groupBy(_._1._1).flatMap { case (cw, offs) =>
      val ordered = offs.toSeq.sortBy(_._1._2)
      ordered.scanLeft(new JBD(0)) { case (c, (_, r)) => c add r }.tail
        .zip(ordered).map { case (cum, ((_, off), r)) =>
          (cw, off) -> ((r.doubleValue, cum.doubleValue))
        }
    }
    val got = SparkEntry.queries("cohort_ltv")(spark, dir).collect()
      .map(r => (epochUs(r.get(0)), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    got shouldBe expect
  }

  test("activity_profile: the hour-of-week matrix recomputes with ISO day numbering") {
    val raw = Tables(spark, dir, "events").select("ts").collect()
      .map { r =>
        val tus = epochUs(r.get(0))
        val days = tus / 86400000000L
        (((days + 3) % 7 + 1), tus % 86400000000L / 3600000000L) // epoch day 0 = Thursday
      }
    val total = raw.length.toLong
    val expect = raw.groupBy(identity).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.length.toLong * 10000 / total))
    }
    val got = SparkEntry.queries("activity_profile")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    got shouldBe expect
    got.keys.map(_._1).toSet shouldBe (1L to 7L).toSet // all ISO days present
  }

  test("join_interval_overlap: pairs equal brute-force overlap over all interval pairs") {
    val iv = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        get_json_object(col("props"), "$.k").cast("int").as("k")).collect()
      .filter(r => r.getInt(4) >= 1)
      .map { r =>
        val s = epochUs(r.get(3))
        (nLong(r, 0), nLong(r, 1), r.getString(2), s, s + r.getInt(4) * 60000000L)
      }
    val errs = iv.filter(_._3 == "error")
    val purch = iv.filter(_._3 == "purchase")
    val expect = (for {
      a <- errs; b <- purch
      if a._2 == b._2 && a._4 < b._5 && b._4 < a._5
    } yield (a._1, b._1) -> (math.min(a._5, b._5) - math.max(a._4, b._4))).toMap
    val got = SparkEntry.queries("join_interval_overlap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe expect
    got should not be empty
  }

  test("join_asof_nearest: NULL purchase values stay paired with their id; NULL-ts rows never match") {
    // the fixture has no NULL value/ts, so this builds one: the review
    // scenario where per-column last(ignoreNulls) would pair a matched id
    // with a FARTHER purchase's value, and where a NULL-ts row would
    // spuriously collect a forward match from the top of the sort
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(sec: Long): java.sql.Timestamp = new java.sql.Timestamp(sec * 1000)
    val rows = Seq(
      Row(1L, t(100), 1L, "purchase", 5.0, "{}"),
      Row(2L, t(200), 1L, "purchase", null, "{}"), // nearer to E but value NULL
      Row(3L, t(210), 1L, "error", 1.0, "{}"), // must match P2 WITH its NULL
      Row(4L, null, 1L, "error", 1.0, "{}"), // NULL ts: never matches
      Row(5L, t(50), 2L, "error", 1.0, "{}"),
      Row(6L, null, 2L, "purchase", 9.0, "{}")) // NULL ts: no candidate
    import scala.jdk.CollectionConverters._
    val dir2 = java.nio.file.Files.createTempDirectory("asof_null").toString
    spark.createDataFrame(
        new java.util.ArrayList[Row](rows.asJava), schema)
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val got = SparkEntry.queries("join_asof_nearest")(spark, dir2).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) null else r.getLong(2)),
          (if (r.isNullAt(3)) null else r.getDouble(3)),
          (if (r.isNullAt(4)) null else r.getString(4)))).toMap
    got shouldBe Map(
      3L -> ((2L, null, "back")), // P2's id WITH P2's NULL value
      4L -> ((null, null, null)),
      5L -> ((null, null, null)))
  }

  test("attribution_first_touch: credit recomputes as the user's first click within 7 days") {
    val evs = Tables(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (nLong(r, 0), nLong(r, 1), r.getString(2), epochUs(r.get(3))))
    val firstClick = evs.groupBy(_._1).map { case (u, xs) =>
      u -> xs.filter(_._3 == "click").sortBy(e => (e._4, e._2)).headOption
    }
    val weekUs = 7L * 86400000000L
    val expect = evs.filter(_._3 == "purchase").map { case (u, id, _, pts) =>
      val credit = firstClick(u)
        .filter { case (_, cid, _, cts) =>
          // the running first_value sees only clicks at/before the purchase
          (cts < pts || (cts == pts && cid < id)) && cts >= pts - weekUs }
      id -> credit.map { case (_, cid, _, cts) => (cid, pts - cts) }
    }.toMap
    val got = SparkEntry.queries("attribution_first_touch")(spark, dir).collect()
      .map { r =>
        r.getLong(0) -> (if (r.isNullAt(3)) None
          else Some((r.getLong(3), r.getLong(4))))
      }.toMap
    got shouldBe expect
    // both outcomes occur: credited journeys AND stale/uncredited ones
    got.values.exists(_.isDefined) shouldBe true
    got.values.exists(_.isEmpty) shouldBe true
  }

  test("agg_weighted_median: the cumulative-weight selection recomputes per flag") {
    val raw = Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getString(0), nDouble(r, 1), math.round(nDouble(r, 2)),
        nLong(r, 3), nLong(r, 4)))
    val expect = raw.groupBy(_._1).map { case (flag, rows) =>
      val ordered = rows.sortBy { case (_, p, _, ok, ln) => (p, ok, ln) }
      val w = ordered.map(_._3).sum
      var cw = 0L
      val med = ordered.find { r => cw += r._3; 2 * cw >= w }.get._2
      flag -> ((med, w))
    }
    val got = SparkEntry.queries("agg_weighted_median")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    got shouldBe expect
  }
}
