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

  // --- the rank family: brute-force recomputations on sf0.001 ----------

  /** Raw (day, arm, cents) triples for the click/purchase cohorts — the
    * rank family's input, recomputed driver-side with BigDecimal cents. */
  private def rankRaw(d: String) = Tables(spark, d, "events")
    .filter(col("ts").isNotNull && col("value").isNotNull
      && col("event_type").isin("click", "purchase"))
    .select(date_trunc("day", col("ts")).cast("timestamp").as("day"),
      col("event_type"), col("value"))
    .collect()
    .map(r => (r.getTimestamp(0), r.getString(1),
      (BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        * 100).toLongExact))
    .groupBy(_._1)

  test("eval_auc: AUC equals the brute-force pair-counting probability") {
    val small = "/root/testdata/sf0.001"
    val byDay = rankRaw(small)
    val rows = SparkEntry.queries("eval_auc")(spark, small).collect()
    rows should not be empty
    rows.foreach { r =>
      val g = byDay(r.getTimestamp(r.fieldIndex("day")))
      val neg = g.filter(_._2 == "click").map(_._3)
      val pos = g.filter(_._2 == "purchase").map(_._3)
      r.getLong(r.fieldIndex("n_neg")) shouldBe neg.size.toLong
      r.getLong(r.fieldIndex("n_pos")) shouldBe pos.size.toLong
      // AUC = P(pos > neg) + ½P(pos == neg), counted over every pair
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      r.getLong(r.fieldIndex("u2")) shouldBe wins // 2U = 2·wins/2 pairs
      r.getDouble(r.fieldIndex("auc")) shouldBe
        (wins.toDouble / (2L * pos.size * neg.size).toDouble)
    }
  }

  test("ab_ks_test: D equals the brute-force ecdf supremum") {
    val small = "/root/testdata/sf0.001"
    val byDay = rankRaw(small)
    val rows = SparkEntry.queries("ab_ks_test")(spark, small).collect()
    rows should not be empty
    rows.foreach { r =>
      val g = byDay(r.getTimestamp(r.fieldIndex("day")))
      val neg = g.filter(_._2 == "click").map(_._3).sorted
      val pos = g.filter(_._2 == "purchase").map(_._3).sorted
      val cuts = (neg ++ pos).distinct
      val dNum = cuts.map { v =>
        (BigInt(neg.count(_ <= v)) * pos.size - BigInt(pos.count(_ <= v)) * neg.size).abs
      }.max
      r.getLong(r.fieldIndex("d_num")) shouldBe dNum.toLong
      r.getDouble(r.fieldIndex("d_stat")) shouldBe
        (dNum.toDouble / (neg.size.toLong * pos.size).toDouble)
    }
  }

  test("ab_ranksum: z recomputes from driver-side average ranks and tie sizes") {
    val small = "/root/testdata/sf0.001"
    val byDay = rankRaw(small)
    val rows = SparkEntry.queries("ab_ranksum")(spark, small).collect()
    rows should not be empty
    rows.foreach { r =>
      val g = byDay(r.getTimestamp(r.fieldIndex("day")))
      val neg = g.filter(_._2 == "click").map(_._3)
      val pos = g.filter(_._2 == "purchase").map(_._3)
      val all = (neg ++ pos).sorted
      // 2×average-rank per value (ties share the mean of their positions)
      val r2ByValue = all.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
        v -> (xs.map(_._2 + 1).map(_.toLong).sum * 2L / xs.size) // integral: sum of an arithmetic run
      }
      val sr2Pos = pos.map(r2ByValue).sum
      val u2 = sr2Pos - pos.size.toLong * (pos.size + 1)
      r.getLong(r.fieldIndex("u2")) shouldBe u2
      val n = all.size.toLong
      val sumT3 = all.groupBy(identity).values
        .map(ts => ts.size.toLong).map(t => t * t * t - t).sum
      val bNum = BigInt(neg.size.toLong * pos.size) *
        BigInt((n + 1) * n * (n - 1) - sumT3)
      val z = (u2 - pos.size.toLong * neg.size).toDouble /
        (2.0 * math.sqrt(bNum.toDouble / (12L * n * (n - 1)).toDouble))
      r.getDouble(r.fieldIndex("z")) shouldBe z
      r.getBoolean(r.fieldIndex("significant")) shouldBe (math.abs(z) > 1.96)
    }
  }

  test("event_interarrival: every bucket row recomputes from a first-principles gap walk") {
    val raw = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull
        && col("event_type").isNotNull)
      .select("user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), epochUs(r.get(2)), r.getLong(3)))
    // consecutive same-(user, type) gaps under the (ts, event_id) order
    val gaps = raw.groupBy(t => (t._1, t._2)).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._3, e._4))
      o.zip(o.tail).map { case (a, b) => (a._2, b._3 - a._3) }
    }
    def bucketOf(g: Long): String =
      if (g < 1000000L) "0_lt_1s" else if (g < 60000000L) "1_lt_1m"
      else if (g < 3600000000L) "2_lt_1h" else if (g < 86400000000L) "3_lt_1d"
      else "4_ge_1d"
    val expect = gaps.groupBy(g => (g._1, bucketOf(g._2))).map { case (k, gs) =>
      k -> (gs.size.toLong, gs.map(_._2).min, gs.map(_._2).max, gs.map(_._2).sum)
    }
    val totals = gaps.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = SparkEntry.queries("event_interarrival")(spark, dir).collect()
    rows should not be empty
    rows.length shouldBe expect.size
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (n, mn, mx, sm) = expect(key)
      withClue(s"$key: ") {
        r.getLong(r.fieldIndex("n_gaps")) shouldBe n
        r.getLong(r.fieldIndex("min_us")) shouldBe mn
        r.getLong(r.fieldIndex("max_us")) shouldBe mx
        r.getLong(r.fieldIndex("avg_us")) shouldBe sm / n
        r.getLong(r.fieldIndex("share_bp")) shouldBe n * 10000 / totals(key._1)
      }
    }
    // non-vacuous: more than one bucket per type is actually populated
    rows.map(_.getString(1)).distinct.length should be > 1
  }

  test("survival_hazard: the KM table recomputes from a first-principles time-to-event walk") {
    val raw = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("d"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getString(2), if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))
    val byUser = raw.groupBy(_._1)
    val anchor = raw.map(_._2.toEpochDay).max
    // per user: (t_days, converted?)
    val obs = byUser.values.map { es =>
      val first = es.map(_._2.toEpochDay).min
      val conv = es.filter(e => e._3 == "purchase" && e._4 >= 20000L)
        .map(_._2.toEpochDay).sorted.headOption
      conv match {
        case Some(c) => (c - first, true)
        case None => (anchor - first, false)
      }
    }.toSeq
    val rows = SparkEntry.queries("survival_hazard")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val t = r.getLong(r.fieldIndex("t_days"))
      withClue(s"t=$t: ") {
        r.getLong(r.fieldIndex("n_risk")) shouldBe obs.count(_._1 >= t).toLong
        r.getLong(r.fieldIndex("n_event")) shouldBe
          obs.count(o => o._1 == t && o._2).toLong
        r.getLong(r.fieldIndex("n_censored")) shouldBe
          obs.count(o => o._1 == t && !o._2).toLong
        r.getLong(r.fieldIndex("hazard_bp")) shouldBe
          obs.count(o => o._1 == t && o._2).toLong * 10000 / obs.count(_._1 >= t)
      }
    }
    // the table covers every observed t and both arms are non-vacuous
    rows.length shouldBe obs.map(_._1).distinct.size
    obs.count(_._2) should be > 0
    obs.count(!_._2) should be > 0
    // the survival curve is EXACTLY the fixed-point integer fold of the
    // hazard rows in t order (1e-9 units, floor at every step), it is
    // non-increasing, and it starts at or below 1
    var s = 1000000000L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val risk = r.getLong(r.fieldIndex("n_risk"))
      val ev2 = r.getLong(r.fieldIndex("n_event"))
      s = s * (risk - ev2) / risk
      r.getLong(r.fieldIndex("surv_e9")) shouldBe s
      s should be <= 1000000000L
    }
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

  test("bpe_pair_counts: every reported count recomputes from a scratch sliding-pair scan") {
    val exact = Tables(spark, dir, "documents").collect()
      .flatMap(r => Option(r.getAs[String]("text")))
      .flatMap(t => t.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val rows = SparkEntry.queries("bpe_pair_counts")(spark, dir).collect()
    rows should have length 100
    rows.foreach { r =>
      withClue(s"pair '${r.getString(0)}': ") {
        r.getLong(r.fieldIndex("n")) shouldBe exact(r.getString(0))
      }
    }
    // the head of the ranking really is the global max
    rows.head.getLong(1) shouldBe exact.values.max
  }

  test("changepoint_cusum: the argmax matches a brute-force scan of every prefix split") {
    val daily = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(18,2)")) * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), epochUs(r.get(1)), r.getLong(2)))
      .groupBy(_._1)
    val got = SparkEntry.queries("changepoint_cusum")(spark, dir).collect()
      .map(r => r.getString(0) -> (epochUs(r.get(r.fieldIndex("change_day"))),
        r.getLong(r.fieldIndex("d_max")))).toMap
    daily.foreach { case (tpe, xs) =>
      val series = xs.sortBy(_._2).map(t => (t._2, t._3))
      val n = series.length
      val sN = series.map(_._2).sum
      val scored = series.map(_._2).scanLeft(0L)(_ + _).tail.zipWithIndex
        .take(n - 1) // i = idx+1, candidate splits exclude the last day
        .map { case (sI, idx) => (series(idx)._1, math.abs(n * sI - (idx + 1) * sN)) }
      val best = scored.maxBy(t => (t._2, -t._1)) // max d, earliest day
      withClue(s"$tpe: ") { got(tpe) shouldBe best }
    }
  }

  test("rank_normalize: pr_bp is a monotone [0,10000] function of the value within a type") {
    val rows = SparkEntry.queries("rank_normalize")(spark, dir).collect()
      .map(r => (r.getString(r.fieldIndex("event_type")),
        r.getLong(r.fieldIndex("cents")), r.getLong(r.fieldIndex("pr_bp"))))
    rows should not be empty
    rows.groupBy(_._1).values.foreach { xs =>
      xs.foreach { case (_, _, bp) => bp should (be >= 0L and be <= 10000L) }
      // sorted by cents, pr_bp never decreases; equal cents ⇒ equal pr_bp
      xs.sortBy(_._2).sliding(2).foreach {
        case Array((_, c1, b1), (_, c2, b2)) =>
          b2 should be >= b1
          if (c1 == c2) b2 shouldBe b1
        case _ =>
      }
    }
  }

  test("dataset_kfold: folds partition the corpus and recompute from md5") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    def fold(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kfold:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 5
    }
    val expect = docs.groupBy(fold).map { case (f, xs) => f -> xs.length.toLong }
    val rows = SparkEntry.queries("dataset_kfold")(spark, dir).collect()
    rows.map(_.getLong(0)).toSet shouldBe expect.keySet
    rows.foreach(r => r.getLong(r.fieldIndex("n_docs")) shouldBe expect(r.getLong(0)))
    rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum shouldBe docs.length.toLong
  }

  test("rare_collapse: mass is conserved and no surviving category is below threshold") {
    val docs = Tables(spark, dir, "documents").collect()
    val counts = docs.groupBy(r => Option(r.getAs[String]("source")))
      .map { case (s, xs) => s -> xs.length.toLong }
    val thresh = docs.length.toLong / 25
    val rows = SparkEntry.queries("rare_collapse")(spark, dir).collect()
    rows.map(r => r.getLong(r.fieldIndex("n_docs"))).sum shouldBe docs.length.toLong
    rows.foreach { r =>
      val cat = Option(r.getString(0))
      if (cat.exists(_ != "__other__"))
        withClue(s"$cat: ") { r.getLong(r.fieldIndex("n_docs")) should be >= thresh }
    }
    val merged = counts.filter { case (s, n) => s.isDefined && n < thresh }
    rows.find(_.getString(0) == "__other__").foreach { r =>
      r.getLong(r.fieldIndex("n_docs")) shouldBe merged.values.sum
      r.getLong(r.fieldIndex("n_merged")) shouldBe merged.size.toLong
    }
  }

  test("ngram_novelty: novelty recomputes from a scratch first-occurrence scan") {
    val docs = Tables(spark, dir, "documents").collect()
      .flatMap(r => Option(r.getAs[String]("text"))
        .map(t => r.getLong(r.fieldIndex("doc_id")) -> t))
      .sortBy(_._1)
    val triOf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, _) =>
      triOf(id).foreach(tr => if (!firstDoc.contains(tr)) firstDoc(tr) = id)
    }
    val rows = SparkEntry.queries("ngram_novelty")(spark, dir).collect()
    rows should not be empty
    // every doc with >=1 trigram appears, and counts recompute exactly
    rows.map(_.getLong(0)).toSet shouldBe triOf.filter(_._2.nonEmpty).keySet
    rows.foreach { r =>
      val id = r.getLong(0)
      val tris = triOf(id)
      withClue(s"doc $id: ") {
        r.getLong(r.fieldIndex("n_tri")) shouldBe tris.size.toLong
        val novel = tris.count(tr => firstDoc(tr) == id).toLong
        r.getLong(r.fieldIndex("n_novel")) shouldBe novel
        r.getLong(r.fieldIndex("novelty_bp")) shouldBe novel * 10000 / tris.size
      }
    }
    // the corpus's first doc is 100% novel by definition
    rows.find(_.getLong(0) == docs.head._1)
      .foreach(_.getLong(3) shouldBe 10000L)
  }

  test("feature_winsorize: clamped values stay in the group's observed range and mass only moves inward") {
    val rows = SparkEntry.queries("feature_winsorize")(spark, dir).collect()
      .map(r => (nLong(r, r.fieldIndex("c_nationkey")),
        r.getLong(r.fieldIndex("cents")), r.getLong(r.fieldIndex("win_cents")),
        r.getBoolean(r.fieldIndex("clipped"))))
    rows should not be empty
    rows.groupBy(_._1).foreach { case (nation, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = sorted(((n + 19) / 20 - 1).toInt)
      val hi = sorted(((19 * n + 19) / 20 - 1).toInt)
      withClue(s"nation $nation (n=$n, lo=$lo, hi=$hi): ") {
        xs.foreach { case (_, c, w, clipped) =>
          w shouldBe math.min(math.max(c, lo), hi)
          clipped shouldBe (c < lo || c > hi)
        }
        // winsorizing never widens the band
        xs.map(_._3).min should be >= lo
        xs.map(_._3).max should be <= hi
      }
    }
  }

  test("ann_recall: recall counts recompute from a from-scratch exact-arithmetic rebuild of both legs") {
    // mirror the engine's arithmetic exactly: elements quantized to
    // DECIMAL(9,7) (HALF_UP), dots exact BigDecimal, divisions IEEE double
    def dec7(f: Float): BigDecimal =
      BigDecimal(f.toDouble).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[BigDecimal], b: Array[BigDecimal]): BigDecimal =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }
        .foldLeft(BigDecimal(0))(_ + _)
    def h60s(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val vecs = Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64)
      .collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray.map(dec7))
      .toMap
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v).toDouble) }
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)).toDouble / (norm(a) * norm(b))
    val cids = vecs.keys.toSeq
      .sortBy(id => (h60s(id.toString), id)).take(8)
    val qids = vecs.keys.toSeq
      .sortBy(id => (h60s(s"probe:$id"), id)).take(20)
    // assignment: argmax over cids by the dot/cn metric, ties cid asc
    val asg = vecs.keys.map { id =>
      id -> cids.map(c => (c, dot(vecs(id), vecs(c)).toDouble / norm(c)))
        .minBy { case (c, m) => (-m, c) }._1
    }.toMap
    val got = SparkEntry.queries("ann_recall")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    got.keySet shouldBe qids.toSet
    qids.foreach { q =>
      val others = vecs.keys.filter(_ != q).toSeq
      val exact = others.map(id => (id, cos(id, q)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val probeCids = cids.map(c => (c, cos(c, q)))
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
      val ivf = others.filter(id => probeCids(asg(id)))
        .map(id => (id, cos(id, q)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      withClue(s"probe $q: ") {
        got(q) shouldBe ((exact.size.toLong, ivf.size.toLong,
          (exact intersect ivf).size.toLong,
          (exact intersect ivf).size.toLong * 10000 / exact.size))
      }
    }
  }

  test("ann_recall_bucketed: recall counts recompute from a from-scratch rebuild of the exact and sketch-gated legs") {
    def dec7(f: Float): BigDecimal =
      BigDecimal(f.toDouble).setScale(7, BigDecimal.RoundingMode.HALF_UP)
    def dot(a: Array[BigDecimal], b: Array[BigDecimal]): BigDecimal =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }
        .foldLeft(BigDecimal(0))(_ + _)
    def h60s(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64)
      .collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)
      .toMap
    val vecs = raw.map { case (id, v) => id -> v.map(dec7) }
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v).toDouble) }
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)).toDouble / (norm(a) * norm(b))
    // the op's 3-bit sign sketch: 1-based dims (1, 22, 43) = 0-based (0, 21, 42)
    def sk(id: Long): Int =
      Seq(0, 21, 42).zipWithIndex.map { case (d, bit) =>
        if (raw(id)(d) >= 0) 1 << bit else 0
      }.sum
    val qids = vecs.keys.toSeq
      .sortBy(id => (h60s(s"probe:$id"), id)).take(20)
    val got = SparkEntry.queries("ann_recall_bucketed")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    got.keySet shouldBe qids.toSet
    qids.foreach { q =>
      val others = vecs.keys.filter(_ != q).toSeq
      val exact = others.map(id => (id, cos(id, q)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      val lsh = others
        .filter(id => Integer.bitCount(sk(id) ^ sk(q)) <= 1)
        .map(id => (id, cos(id, q)))
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      withClue(s"probe $q: ") {
        got(q) shouldBe ((exact.size.toLong, lsh.size.toLong,
          (exact intersect lsh).size.toLong,
          (exact intersect lsh).size.toLong * 10000 / exact.size))
      }
    }
  }

  test("session_stats: every rollup recomputes from a first-principles session rebuild") {
    val events = Tables(spark, dir, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val expected = events.groupBy(_._2).flatMap { case (u, rows) =>
      // the op's order: ts ASC NULLS FIRST, event_id ASC
      val sorted = rows.sortBy { case (eid, _, tus) =>
        (tus.isDefined, tus.getOrElse(0L), eid)
      }
      var sid = 0L; var prev: Option[Long] = None
      val tagged = sorted.map { case (eid, _, tus) =>
        val isNew = prev.isEmpty || tus.isEmpty ||
          tus.get - prev.get >= 30L * 60 * 1000000
        if (isNew) sid += 1
        prev = tus
        (sid, eid, tus)
      }
      tagged.groupBy(_._1).map { case (s, evs) =>
        val ts = evs.flatMap(_._3)
        (u, s) -> ((evs.length.toLong,
          if (ts.isEmpty) None else Some(ts.min),
          if (ts.isEmpty) None else Some(ts.max),
          if (ts.isEmpty) None else Some(ts.max - ts.min),
          evs.length == 1))
      }
    }
    val got = SparkEntry.queries("session_stats")(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"),
        unix_micros(col("start_ts").cast("timestamp")).as("s"),
        unix_micros(col("end_ts").cast("timestamp")).as("e"),
        col("dur_us"), col("bounce"))
      .collect()
      .map { r =>
        def optL(i: Int): Option[Long] =
          if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), optL(3), optL(4), optL(5), r.getBoolean(6)))
      }.toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (k, v) =>
      withClue(s"session $k: ") { got(k) shouldBe v }
    }
    // non-vacuous both ways: multi-event sessions and bounces both exist
    got.values.count(_._5) should be > 0
    got.values.count(!_._5) should be > 0
  }

  test("assoc_rules: every rule recomputes from first-principles basket sets") {
    val pairs: Set[(Long, String)] = Tables(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val baskets: Map[Long, Set[String]] =
      pairs.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2) }
    val nUsers = baskets.size.toLong
    val itemN = baskets.values.toSeq.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val types = itemN.keys.toSeq
    val expected = (for {
      a <- types; b <- types if a != b
      both = baskets.values.count(s => s(a) && s(b)).toLong if both > 0
    } yield (a, b) -> ((both, itemN(a), itemN(b), nUsers,
      both * 10000 / nUsers, both * 10000 / itemN(a),
      (both.toDouble * nUsers.toDouble) / (itemN(a).toDouble * itemN(b).toDouble)
    ))).toMap
    val got = SparkEntry.queries("assoc_rules")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getDouble(8)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (k, v) =>
      withClue(s"rule $k: ") { got(k) shouldBe v }
    }
    got should not be empty
  }

  test("text_readability: counts and both formulas recompute from first-principles regex counting") {
    val docs = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("text_readability")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))).toMap
    got.keySet shouldBe docs.keySet
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1).length
      val sents = math.max("[.!?]+".r.findAllIn(text).length, 1)
      val syll = "[aeiouyAEIOUY]+".r.findAllIn(text).length
      val ease = 206.835 - 1.015 * (w.toDouble / sents) - 84.6 * (syll.toDouble / w)
      val fk = 0.39 * (w.toDouble / sents) + 11.8 * (syll.toDouble / w) - 15.59
      val band = if (ease >= 60) "easy" else if (ease >= 30) "standard" else "hard"
      withClue(s"doc $id: ") {
        got(id) shouldBe ((w, sents, syll, ease, fk, band))
      }
    }
  }

  test("event_rfm: metrics, quintile scores and segment recompute from first principles") {
    val events = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("day"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, Option(r.get(2))
        .map(v => BigDecimal(v.asInstanceOf[Double])
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
        .getOrElse(0L)))
    val asof = events.map(_._2).max
    val users = events.groupBy(_._1).map { case (u, rows) =>
      u -> ((java.time.temporal.ChronoUnit.DAYS.between(
        rows.map(_._2).max, asof), rows.length.toLong, rows.map(_._3).sum))
    }
    def pct(sorted: Array[Double], p: Double): Double = {
      val rank = (sorted.length - 1) * p
      val lo = rank.toInt
      if (lo == rank) sorted(lo)
      else sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo))
    }
    def quints(vs: Iterable[Long]): Seq[Double] = {
      val sorted = vs.map(_.toDouble).toArray.sorted
      Seq(0.2, 0.4, 0.6, 0.8).map(pct(sorted, _))
    }
    val (rq, fq, mq) = (quints(users.values.map(_._1)),
      quints(users.values.map(_._2)), quints(users.values.map(_._3)))
    val got = SparkEntry.queries("event_rfm")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))).toMap
    got.keySet shouldBe users.keySet
    users.foreach { case (u, (r, f, m)) =>
      val rs = 1 + rq.count(r < _)
      val fs = 1 + fq.count(f > _)
      val ms = 1 + mq.count(m > _)
      withClue(s"user $u: ") {
        got(u) shouldBe ((r, f, m, rs, fs, ms, s"$rs$fs$ms"))
      }
    }
    // quintile scoring is non-degenerate on the fixture: all 5 f-scores occur
    got.values.map(_._5).toSet shouldBe Set(1, 2, 3, 4, 5)
  }

  test("curriculum_order: bands and positions recompute from the quality table plus first-principles quartiles") {
    def h60s(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // ground quality in the SHIPPED quality_score output (shared stage),
    // restricted to scorable docs like the curriculum contract
    val textful = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val quality = SparkEntry.queries("quality_score")(spark, dir).collect()
      .filter(r => textful.contains(r.getLong(0)))
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality"))).toMap
    // percentile_cont: rank (n-1)p, linear interpolation on the sorted run
    val sorted = quality.values.toArray.sorted
    def pct(p: Double): Double = {
      val rank = (sorted.length - 1) * p
      val lo = rank.toInt
      if (lo == rank) sorted(lo)
      else sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val (t25, t50, t75) = (pct(0.25), pct(0.5), pct(0.75))
    def band(q: Double): Int =
      if (q >= t75) 1 else if (q >= t50) 2 else if (q >= t25) 3 else 4
    val expected = quality.toSeq
      .map { case (id, q) => (id, textful(id), q, band(q)) }
      .groupBy { case (_, src, _, b) => (src, b) }
      .flatMap { case (_, rows) =>
        rows.sortBy { case (id, _, _, _) => (h60s(s"curriculum:$id"), id) }
          .zipWithIndex
          .map { case ((id, src, q, b), i) => id -> ((src, q, b, i + 1L)) }
      }
    val got = SparkEntry.queries("curriculum_order")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getInt(3), r.getLong(4)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (id, v) =>
      withClue(s"doc $id: ") { got(id) shouldBe v }
    }
    // every band is non-vacuous on the fixture
    got.values.map(_._3).toSet shouldBe Set(1, 2, 3, 4)
  }

  test("benford_audit: digits, counts and chi2 recompute from first-principles cents arithmetic") {
    val events = Tables(spark, dir, "events")
      .select("event_type", "value").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getDouble(1)))
    val digits = events.flatMap { case (t, v) =>
      val cents = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
      if (cents == 0) None
      else Some((t, math.abs(cents).toString.charAt(0).asDigit))
    }
    val expBp = Seq(3010, 1761, 1249, 969, 792, 669, 580, 512, 458)
    expBp.sum shouldBe 10000 // the Benford constants are a full partition
    val byType = digits.groupBy(_._1)
    val got = SparkEntry.queries("benford_audit")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getBoolean(8))).toMap
    got.keySet shouldBe byType.keySet.flatMap(t => (1 to 9).map(t -> _))
    byType.foreach { case (typ, rows) =>
      val n = rows.length.toLong
      val terms = (1 to 9).map { dg =>
        val o = rows.count(_._2 == dg).toLong
        val e = expBp(dg - 1)
        val num = (10000L * o - n * e).toDouble
        val term = BigDecimal(num * num / (10000d * n.toDouble * e.toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (dg, o, term)
      }
      val chi2 = terms.map(_._3).sum.toDouble
      terms.foreach { case (dg, o, _) =>
        withClue(s"($typ, $dg): ") {
          got((typ, dg)) shouldBe ((o, n, o * 10000 / n, expBp(dg - 1).toLong,
            o * 10000 / n - expBp(dg - 1), chi2, chi2 > 15.507))
        }
      }
    }
  }

  test("contamination_matrix: every cell recomputes from first-principles string shingle sets") {
    // rebuild with raw STRING shingles (no hashing at all) — agreement
    // also certifies the shipped 60-bit hash stage collision-free here
    val docs = Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .filter(_.get(1) != null)
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).map { case (src, rows) =>
      src -> rows.flatMap { case (_, text) =>
        val w = text.split(" ", -1)
        val n = math.max(w.length - 4, 1)
        (0 until n).map(i => w.slice(i, i + 5).mkString(" "))
      }.toSet
    }
    val got = SparkEntry.queries("contamination_matrix")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val expected = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      shared = (bySource(a) intersect bySource(b)).size if shared > 0
    } yield (a, b) -> ((shared.toLong, bySource(a).size.toLong,
      bySource(b).size.toLong,
      shared.toLong * 10000 / math.min(bySource(a).size, bySource(b).size)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (k, v) =>
      withClue(s"pair $k: ") { got(k) shouldBe v }
    }
    got should not be empty // the overlap table is non-vacuous on the fixture
  }

  test("chunk_merge: every reassembly is exact and multi-chunk docs are actually exercised") {
    val rows = SparkEntry.queries("chunk_merge")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getBoolean(r.fieldIndex("ok")) shouldBe true
      }
    }
    // non-vacuous: the overlap-trimming path (chunks > 1) must be exercised
    rows.count(_.getLong(1) > 1) should be > 0
    // chunk counts recompute: ceil(tokens / stride)
    val docs = Tables(spark, dir, "documents").collect()
      .flatMap(r => Option(r.getAs[String]("text"))
        .map(t => r.getLong(r.fieldIndex("doc_id")) -> t.split(" ", -1).length))
      .toMap
    rows.foreach { r =>
      val n = docs(r.getLong(0))
      r.getLong(r.fieldIndex("n_chunks")) shouldBe ((n + 39) / 40).toLong
    }
  }

  test("lang_id_eval: the confusion matrix recomputes from lang_id's row-level output") {
    val pred = SparkEntry.queries("lang_id")(spark, dir).collect()
      .map(r => (Option(r.getString(1)), r.getString(2)))
    val expect = pred.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rows = SparkEntry.queries("lang_id_eval")(spark, dir).collect()
    rows should not be empty
    rows.map(r => r.getLong(r.fieldIndex("n"))).sum shouldBe pred.length.toLong
    rows.foreach { r =>
      val k = (Option(r.getString(0)), r.getString(1))
      withClue(s"cell $k: ") {
        r.getLong(r.fieldIndex("n")) shouldBe expect(k)
        r.getBoolean(r.fieldIndex("correct")) shouldBe k._1.contains(k._2)
      }
    }
    // the eval is non-degenerate: both correct and incorrect cells exist
    rows.map(_.getBoolean(3)).toSet shouldBe Set(true, false)
  }

  test("minhash_eval: every candidate matches a full band and the exact jaccard recomputes from raw shingles") {
    val rows = SparkEntry.queries("minhash_eval")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (m, est, jac, err) = (r.getLong(r.fieldIndex("matches")),
        r.getLong(r.fieldIndex("est_bp")), r.getLong(r.fieldIndex("jac_bp")),
        r.getLong(r.fieldIndex("err_bp")))
      withClue(s"pair (${r.getLong(0)},${r.getLong(1)}): ") {
        m should be >= 2L // a candidate collided on a FULL 2-hash band
        m should be <= 8L
        est shouldBe m * 1250
        jac should (be >= 0L and be <= 10000L)
        err shouldBe est - jac
      }
    }
    // exact jaccard recomputes from the raw texts' hashed 3-shingle sets
    def h60s(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val texts = Tables(spark, dir, "documents").collect()
      .flatMap(r => Option(r.getAs[String]("text"))
        .map(t => r.getLong(r.fieldIndex("doc_id")) -> t)).toMap
    def shingleHashes(t: String): Set[Long] = {
      val w = t.split(" ", -1)
      val n = math.max(w.length - 2, 1)
      // shingles3 applies array_distinct BEFORE hashing — set semantics
      (0 until n).map(i => w.slice(i, i + 3).mkString(" ")).distinct
        .map(h60s).toSet
    }
    rows.take(10).foreach { r => // spot-check 10 pairs against raw text
      val (a, b) = (shingleHashes(texts(r.getLong(0))), shingleHashes(texts(r.getLong(1))))
      val inter = a.intersect(b).size.toLong
      val uni = a.size.toLong + b.size - inter
      withClue(s"pair (${r.getLong(0)},${r.getLong(1)}): ") {
        r.getLong(r.fieldIndex("jac_bp")) shouldBe inter * 10000 / uni
      }
    }
  }

  test("tokenize_ids: every id sequence recomputes from a scratch vocab build") {
    val docs = Tables(spark, dir, "documents").collect()
      .flatMap(r => Option(r.getAs[String]("text"))
        .map(t => r.getLong(r.fieldIndex("doc_id")) -> t.split(" ", -1)))
      .sortBy(_._1)
    val counts = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.length }
    val vocab = counts.toSeq.sortBy { case (w, n) => (-n, w) }.take(256)
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    val got = SparkEntry.queries("tokenize_ids")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        // ids is a space-delimited VARCHAR since r11 (the contract hasher
        // cannot canonicalize nested types) — parse it back for the check
        r.getString(r.fieldIndex("ids")).split(" ", -1).map(_.toLong).toSeq))
      .toMap
    got.keySet shouldBe docs.map(_._1).toSet
    docs.foreach { case (id, ws) =>
      val ids = ws.map(w => vocab.getOrElse(w, 0L)).toSeq
      withClue(s"doc $id: ") {
        got(id) shouldBe ((ws.length.toLong, ids.count(_ == 0L).toLong, ids))
      }
    }
  }

  test("simhash_eval: a shared band bounds hamming at 45 and the dedup gate is exactly the <=6 slice") {
    val eval = SparkEntry.queries("simhash_eval")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(r.fieldIndex("hamming")),
        r.getLong(r.fieldIndex("jac_bp"))))
    eval should not be empty
    eval.foreach { case (a, b, h, j) =>
      withClue(s"pair ($a,$b): ") {
        h should be <= 45L // one shared 15-bit band ⇒ ≥15 equal bits
        h should be >= 0L
        j should (be >= 0L and be <= 10000L)
      }
    }
    // cross-op consistency: the shipped dedup gate IS this audit's ≤6 slice
    val gate = SparkEntry.queries("dedup_simhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    eval.filter(_._3 <= 6).map(t => (t._1, t._2)).toSet shouldBe gate
  }

  test("dedup_agreement: the two flag columns are exactly the shipped methods' pair sets") {
    val rows = SparkEntry.queries("dedup_agreement")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        r.getBoolean(r.fieldIndex("in_minhash")),
        r.getBoolean(r.fieldIndex("in_ngram"))))
    rows should not be empty
    rows.foreach { case (p, m, g) =>
      withClue(s"pair $p: ") { (m || g) shouldBe true } // no phantom rows
    }
    val mGot = rows.filter(_._2).map(_._1).toSet
    val gGot = rows.filter(_._3).map(_._1).toSet
    val mShip = SparkEntry.queries("dedup_minhash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gShip = SparkEntry.queries("dedup_ngram")(spark, dir).collect()
      .filter(_.getDouble(2) >= 0.5).map(r => (r.getLong(0), r.getLong(1))).toSet
    mGot shouldBe mShip // the audit's minhash side IS dedup_minhash's output
    gGot shouldBe gShip // and its ngram side IS dedup_ngram's >=0.5 slice
  }

  test("numeric_sanitize: the gate classifies a hand-built NaN/Inf fixture the driver data cannot contain") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val rows = java.util.Arrays.asList(
      Row(1L, ts, 1L, "click", 5.0, "{}"),
      Row(2L, ts, 1L, "click", Double.NaN, "{}"),
      Row(3L, ts, 1L, "click", Double.PositiveInfinity, "{}"),
      Row(4L, ts, 1L, "click", Double.NegativeInfinity, "{}"),
      Row(5L, ts, 1L, "click", null, "{}"),
      Row(6L, ts, 1L, "click", 9.9e15, "{}"), // over the 1e12 magnitude gate
      Row(7L, ts, 1L, "click", -1e12, "{}")) // at the bound: still ok
    val dir = java.nio.file.Files.createTempDirectory("graft_nanfix").toString
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("numeric_sanitize")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(r.fieldIndex("verdict")),
        Option(r.get(r.fieldIndex("clean_value"))))).toMap
    out(1L) shouldBe (("ok", Some(5.0)))
    out(2L)._1 shouldBe "nan"
    out(2L)._2 shouldBe None // non-finite sanitized to NULL
    out(3L) shouldBe (("inf", None))
    out(4L) shouldBe (("inf", None))
    out(5L) shouldBe (("null", None))
    out(6L) shouldBe (("big", None)) // magnitude gate: decimal headroom
    out(7L) shouldBe (("ok", Some(-1e12))) // |v| = bound is inside
  }

  test("split_temporal: the leak count is the true train∩holdout user intersection") {
    val cut = java.sql.Timestamp.valueOf("2024-01-24 00:00:00").getTime * 1000L
    val ev = Tables(spark, dir, "events").filter(col("ts").isNotNull)
      .select("event_type", "user_id", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1), epochUs(r.get(2))))
    val rows = SparkEntry.queries("split_temporal")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val tpe = Option(r.getString(0))
      val xs = ev.filter(e => Option(e._1) == tpe)
      val (tr, ho) = xs.partition(_._3 < cut)
      withClue(s"$tpe: ") {
        r.getLong(r.fieldIndex("n_train")) shouldBe tr.length.toLong
        r.getLong(r.fieldIndex("n_holdout")) shouldBe ho.length.toLong
        val leak = tr.map(_._2).toSet intersect ho.map(_._2).toSet
        r.getLong(r.fieldIndex("u_leaked")) shouldBe leak.size.toLong
        val uHo = ho.map(_._2).toSet.size.toLong
        r.getLong(r.fieldIndex("leak_bp")) shouldBe
          (if (uHo == 0) 0L else leak.size.toLong * 10000 / uHo)
      }
    }
  }

  test("fuzzy_eval: kept == the shipped dedup_fuzzy gate restricted to the sample, and the blocking-miss band is non-empty") {
    val rows = SparkEntry.queries("fuzzy_eval")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(r.fieldIndex("dist")),
        r.getBoolean(r.fieldIndex("blocked")), r.getBoolean(r.fieldIndex("kept"))))
    rows should not be empty
    rows.foreach { case (p, dist, blocked, kept) =>
      withClue(s"pair $p: ") {
        dist should (be >= 0 and be <= 2)
        kept shouldBe (blocked && dist <= 1)
        p._1 should be < p._2
      }
    }
    // first-principles sample recompute: the same salted-hash top-200
    val sample = Tables(spark, dir, "customer")
      .withColumn("h", graft.ops.Text.h60(
        concat(lit("fz:"), col("c_custkey").cast("string"))))
      .orderBy(col("h").asc, col("c_custkey").asc).limit(200)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val shipped = SparkEntry.queries("dedup_fuzzy")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => sample(p._1) && sample(p._2)).toSet
    rows.filter(_._4).map(_._1).toSet shouldBe shipped
    // the audit's reason to exist: true matches the prefix block misses
    // (the edit fell inside the first 16 chars) are observable
    rows.filter(r => r._2 <= 1 && !r._3) should not be empty
  }

  test("substring_eval: the stride-1 probe dominates the strided detector (alignment loss is one-sided)") {
    val rows = SparkEntry.queries("substring_eval")(spark, dir).collect()
    rows should have size 100
    rows.foreach { r =>
      val st = r.getLong(r.fieldIndex("n_strided"))
      val pr = r.getLong(r.fieldIndex("n_probe"))
      withClue(s"doc ${r.getLong(0)}: ") {
        st should be >= 0L
        // every duplicated strided window of this doc is also one of its
        // stride-1 windows, and its duplicate lives in ANOTHER doc's
        // strided index by the >=2-distinct-docs rule — so probe >= strided
        pr should be >= st
        if (r.getBoolean(r.fieldIndex("flagged_strided")))
          r.getBoolean(r.fieldIndex("flagged_probe")) shouldBe true
      }
    }
    // non-vacuous on the driver fixture: the corpus contains duplicated runs
    rows.count(_.getBoolean(3)) should be > 0
  }

  test("tokenizer_fertility: every per-language sum recomputes from scratch") {
    val bpeRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]".r
    val docs = Tables(spark, dir, "documents").collect()
      .flatMap(r => Option(r.getAs[String]("text"))
        .filter(_.nonEmpty)
        .map(t => Option(r.getAs[String]("lang")) -> t))
    val byLang = docs.groupBy(_._1).map { case (l, xs) =>
      val ts = xs.map(_._2)
      val ws = ts.map(_.split(" ", -1).length.toLong).sum
      val bpe = ts.map(t => bpeRe.findAllIn(t).length.toLong).sum
      val chars = ts.map(t => t.codePointCount(0, t.length).toLong).sum
      val bytes = ts.map(_.getBytes("UTF-8").length.toLong).sum
      l -> ((ts.length.toLong, bpe, ws, bpe * 10000 / ws,
        chars * 10000 / ws, bytes * 10000 / chars))
    }
    val got = SparkEntry.queries("tokenizer_fertility")(spark, dir).collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    got.keySet shouldBe byLang.keySet
    byLang.foreach { case (l, exp) =>
      withClue(s"lang $l: ") { got(l) shouldBe exp }
    }
  }

  test("sample_temperature: alpha=1/2 weights recompute exactly and upweight the tail") {
    val rows = SparkEntry.queries("sample_temperature")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex("n_tokens")),
        r.getLong(r.fieldIndex("w_bp")), r.getLong(r.fieldIndex("repeat_bp"))))
    rows should not be empty
    // first principles: sq = floor(sqrt(n)*1e6); w = sq*10000 div sum(sq)
    val sq = rows.map { case (src, n, _, _) =>
      src -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    }.toMap
    val totSq = sq.values.sum
    val totTok = rows.map(_._2).sum
    rows.foreach { case (src, n, w, rep) =>
      withClue(s"source $src: ") {
        w shouldBe sq(src) * 10000 / totSq
        rep shouldBe (totTok * w / 10000) * 10000 / n
      }
    }
    // floor division loses at most |sources| bp of mass
    val wSum = rows.map(_._3).sum
    wSum should be <= 10000L
    wSum should be > 10000L - rows.length.toLong
    // the point of temperature < 1: smaller sources get LARGER repeat
    // factors (strictly ordered pairs must not invert)
    for (a <- rows; b <- rows if a._2 < b._2)
      withClue(s"${a._1} (${a._2} tok) vs ${b._1} (${b._2} tok): ") {
        a._4 should be >= b._4
      }
  }

  /** Driver-side cents quantization — the house DECIMAL(18,2)×100 rule. */
  private def centsOf(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  /** Driver-side twin of the Spark/DuckDB h60 hash. */
  private def h60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("ab_srm: d and chi2 recompute from first-principles daily counts, and the day mixes sum to the global mix") {
    val raw = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isin("click", "purchase"))
      .select(date_trunc("day", col("ts")).cast("timestamp").as("day"),
        col("event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)))
    val byDay = raw.groupBy(_._1)
    val gA = raw.count(_._2 == "click").toLong
    val gB = raw.count(_._2 == "purchase").toLong
    val rows = SparkEntry.queries("ab_srm")(spark, dir).collect()
    rows.length shouldBe byDay.size
    rows.foreach { r =>
      val g = byDay(r.getTimestamp(r.fieldIndex("day")))
      val (oA, oB) = (g.count(_._2 == "click").toLong,
        g.count(_._2 == "purchase").toLong)
      r.getLong(r.fieldIndex("n_a")) shouldBe oA
      r.getLong(r.fieldIndex("n_b")) shouldBe oB
      val d = oA * gB - oB * gA
      r.getLong(r.fieldIndex("d_stat")) shouldBe d
      r.getDouble(r.fieldIndex("chi2")) shouldBe
        d.toDouble * d.toDouble / ((oA + oB).toDouble * gA.toDouble * gB.toDouble)
    }
    // the imbalances cancel globally: Σ_day d = Σ o_a·g_b − Σ o_b·g_a = 0
    rows.map(_.getLong(rows.head.fieldIndex("d_stat"))).sum shouldBe 0L
  }

  test("ab_cuped: theta and the adjusted means recompute from first-principles user sums, and adjustment preserves the pooled mean") {
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val users = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp"), col("value"))
      .collect()
      .groupBy(_.getLong(0)).map { case (uid, rs) =>
        def cents(pre: Boolean) = rs.filter { r =>
          val isPre = r.getTimestamp(1).before(split)
          isPre == pre && !r.isNullAt(2)
        }.map(r => centsOf(r.getDouble(2))).sum
        (uid, cents(pre = true), cents(pre = false))
      }.toSeq
    val byArm = users.groupBy(u => h60Jvm(s"cuped:${u._1}") % 2)
    // pooled sufficient stats, exact
    val (pn, psx, psy) = (users.size.toLong, users.map(_._2).sum, users.map(_._3).sum)
    val psxx = users.map(u => BigInt(u._2) * BigInt(u._2)).sum
    val psxy = users.map(u => BigInt(u._2) * BigInt(u._3)).sum
    val theta = (pn.toDouble * psxy.toDouble - psx.toDouble * psy.toDouble) /
      (pn.toDouble * psxx.toDouble - psx.toDouble * psx.toDouble)
    val rows = SparkEntry.queries("ab_cuped")(spark, dir).collect()
    rows.length shouldBe 2 // both arms materialize
    rows.foreach { r =>
      val arm = byArm(r.getLong(r.fieldIndex("arm")))
      val n = arm.size.toLong
      r.getLong(r.fieldIndex("n")) shouldBe n
      val meanX = arm.map(_._2).sum.toDouble / n / 100.0
      val meanY = arm.map(_._3).sum.toDouble / n / 100.0
      r.getDouble(r.fieldIndex("mean_x")) shouldBe meanX
      r.getDouble(r.fieldIndex("mean_y")) shouldBe meanY
      r.getDouble(r.fieldIndex("theta")) shouldBe theta
      r.getDouble(r.fieldIndex("mean_y_adj")) shouldBe
        meanY - theta * (meanX - psx.toDouble / pn / 100.0)
    }
    // CUPED moves variance, not the estimand: Σ n·adj == Σ n·raw (to fp)
    val rawMean = rows.map(r =>
      r.getLong(r.fieldIndex("n")) * r.getDouble(r.fieldIndex("mean_y"))).sum
    val adjMean = rows.map(r =>
      r.getLong(r.fieldIndex("n")) * r.getDouble(r.fieldIndex("mean_y_adj"))).sum
    adjMean shouldBe rawMean +- math.abs(rawMean) * 1e-9
  }

  /** Driver-side (cents, isPos) score pairs — calibration/gains input. */
  private def scoreRaw() = Tables(spark, dir, "events")
    .filter(col("ts").isNotNull && col("value").isNotNull
      && col("event_type").isin("click", "purchase"))
    .select(col("event_type"), col("value"))
    .collect()
    .map(r => (centsOf(r.getDouble(1)), r.getString(0) == "purchase"))

  test("calibration_table: buckets, rates and averages recompute from a first-principles sorted walk") {
    val raw = scoreRaw()
    val n = raw.length.toLong
    val p = raw.count(_._2).toLong
    // tie-group start positions under ascending cents
    val groups = raw.groupBy(_._1).toSeq.sortBy(_._1)
    var pos = 1L
    val byBucket = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long)] // n, n_pos, sum_cents
    groups.foreach { case (c, xs) =>
      val b = (pos - 1) * 10 / n
      val (bn, bp, bs) = byBucket.getOrElse(b, (0L, 0L, 0L))
      byBucket(b) = (bn + xs.length, bp + xs.count(_._2), bs + c * xs.length)
      pos += xs.length
    }
    val rows = SparkEntry.queries("calibration_table")(spark, dir).collect()
    rows.length shouldBe byBucket.size
    rows.foreach { r =>
      val (bn, bp, bs) = byBucket(r.getLong(r.fieldIndex("bucket")))
      r.getLong(r.fieldIndex("n")) shouldBe bn
      r.getLong(r.fieldIndex("n_pos")) shouldBe bp
      r.getLong(r.fieldIndex("rate_bp")) shouldBe bp * 10000 / bn
      r.getLong(r.fieldIndex("avg_cents")) shouldBe bs / bn
      r.getLong(r.fieldIndex("base_bp")) shouldBe p * 10000 / n
    }
    rows.map(_.getLong(rows.head.fieldIndex("n"))).sum shouldBe n
  }

  test("gains_table: cumulative capture is monotone, ends at 100%, and every decile recomputes from a first-principles descending walk") {
    val raw = scoreRaw()
    val n = raw.length.toLong
    val p = raw.count(_._2).toLong
    val groups = raw.groupBy(_._1).toSeq.sortBy(-_._1)
    var pos = 1L
    val byDecile = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    groups.foreach { case (_, xs) =>
      val d = (pos - 1) * 10 / n + 1
      val (dn, dp) = byDecile.getOrElse(d, (0L, 0L))
      byDecile(d) = (dn + xs.length, dp + xs.count(_._2))
      pos += xs.length
    }
    val rows = SparkEntry.queries("gains_table")(spark, dir).collect()
    rows.length shouldBe byDecile.size
    var cum = 0L
    var lastGain = -1L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val (dn, dp) = byDecile(r.getLong(r.fieldIndex("decile")))
      r.getLong(r.fieldIndex("n")) shouldBe dn
      r.getLong(r.fieldIndex("n_pos")) shouldBe dp
      cum += dp
      r.getLong(r.fieldIndex("cum_pos")) shouldBe cum
      val gain = r.getLong(r.fieldIndex("gain_bp"))
      gain shouldBe cum * 10000 / p
      gain should be >= lastGain // capture can only grow
      lastGain = gain
      r.getDouble(r.fieldIndex("lift")) shouldBe
        dp.toDouble * n.toDouble / (dn.toDouble * p.toDouble)
    }
    lastGain shouldBe 10000L // the full population captures every positive
  }

  test("bootstrap_ci: every replicate mean recomputes from first-principles nibble weights and the band brackets the order statistics") {
    val small = "/root/testdata/sf0.001"
    val raw = Tables(spark, small, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull
        && col("event_type").isNotNull && col("event_id").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), centsOf(r.getDouble(2))))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long): String =
      md.digest(s"boot:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def w(id: Long, b: Int): Long = {
      val nib = Integer.parseInt(hex(id).substring(b, b + 1), 16)
      if (nib < 6) 0L else if (nib < 12) 1L else if (nib < 14) 2L else 3L
    }
    val byType = raw.groupBy(_._1)
    val rows = SparkEntry.queries("bootstrap_ci")(spark, small).collect()
    rows.length shouldBe byType.size
    rows.foreach { r =>
      val g = byType(r.getString(r.fieldIndex("event_type")))
      r.getLong(r.fieldIndex("n")) shouldBe g.length.toLong
      r.getLong(r.fieldIndex("mean_cents")) shouldBe g.map(_._3).sum / g.length
      val repMeans = (0 until 32).flatMap { b =>
        val sw = g.map(e => w(e._2, b)).sum
        if (sw > 0) Some(g.map(e => w(e._2, b) * e._3).sum / sw) else None
      }.sorted
      r.getLong(r.fieldIndex("n_reps")) shouldBe repMeans.size.toLong
      r.getLong(r.fieldIndex("ci_lo_cents")) shouldBe repMeans(1)
      r.getLong(r.fieldIndex("ci_hi_cents")) shouldBe repMeans(repMeans.size - 2)
      r.getLong(r.fieldIndex("ci_lo_cents")) should be <=
        r.getLong(r.fieldIndex("ci_hi_cents"))
    }
  }

  test("ab_power: the sizing recomputes from first-principles moments and scales inversely with the squared effect") {
    val raw = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull
        && col("event_type").isNotNull)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), centsOf(r.getDouble(1))))
      .groupBy(_._1)
    val rows = SparkEntry.queries("ab_power")(spark, dir).collect()
    rows.length shouldBe raw.size
    rows.foreach { r =>
      val xs = raw(r.getString(r.fieldIndex("event_type"))).map(_._2)
      val n = xs.length.toLong
      r.getLong(r.fieldIndex("n")) shouldBe n
      val mean = xs.sum.toDouble / n
      val varc = (xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        - xs.sum.toDouble * xs.sum.toDouble / n) / (n - 1)
      r.getDouble(r.fieldIndex("mean_cents")) shouldBe mean
      r.getDouble(r.fieldIndex("var_cents2")) shouldBe varc
      val z = 1.96 + 0.8416
      val mde = 0.05 * mean
      r.getLong(r.fieldIndex("n_required")) shouldBe
        math.ceil(2.0 * varc * (z * z) / (mde * mde)).toLong
      // sanity of the formula's direction: the required n detects a 5%
      // lift, so it must exceed what a 10% lift would need (4x smaller)
      r.getLong(r.fieldIndex("n_required")).toDouble should be >=
        2.0 * varc * z * z / (4 * mde * mde)
    }
  }

  test("attribution_time_decay: every pair recomputes from a first-principles click walk and credits nearly sum to 10000 per purchase") {
    val small = "/root/testdata/sf0.001"
    val ev = Tables(spark, small, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_type"), col("event_id"), col("user_id"),
        col("ts").cast("timestamp"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000))
    val clicksByUser = ev.filter(_._1 == "click").groupBy(_._3)
    val rows = SparkEntry.queries("attribution_time_decay")(spark, small).collect()
    rows should not be empty
    val byPurchase = rows.groupBy(_.getLong(0))
    ev.filter(_._1 == "purchase").foreach { case (_, pid, uid, pus) =>
      val expected = clicksByUser.getOrElse(uid, Array.empty)
        .filter(c => c._4 <= pus && c._4 >= pus - 7L * 86400000000L)
        .sortBy(c => (-c._4, -c._2)).take(64) // the recency touch cap
        .map { c =>
          val age = (pus - c._4) / 86400000000L
          (c._2, age, 1L << (7 - age))
        }.sortBy(_._1)
      val got = byPurchase.getOrElse(pid, Array.empty)
        .map(r => (r.getLong(r.fieldIndex("click_id")),
          r.getLong(r.fieldIndex("age_days")), r.getLong(r.fieldIndex("w"))))
        .sortBy(_._1)
      withClue(s"purchase $pid: ") { got.toSeq shouldBe expected.toSeq }
      if (expected.nonEmpty) {
        val sw = expected.map(_._3).sum
        val credits = byPurchase(pid).map(r => r.getLong(r.fieldIndex("credit_bp")))
        credits.zip(got.map(_._3)).foreach { case (c, w) =>
          c shouldBe w * 10000 / sw
        }
        // floor division loses < 1 bp per touch, never gains
        credits.sum should be <= 10000L
        credits.sum should be > 10000L - credits.length.toLong
      }
    }
  }

  test("rolling_corr: r recomputes from a first-principles trailing walk and is Cauchy-Schwarz-bounded") {
    val daily = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isin("click", "purchase"))
      .select(date_trunc("day", col("ts")).cast("timestamp").as("day"),
        col("event_type"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)))
      .groupBy(_._1).toSeq.sortBy(_._1.getTime)
      .map { case (d, g) =>
        (d, g.count(_._2 == "click").toLong, g.count(_._2 == "purchase").toLong)
      }
    val rows = SparkEntry.queries("rolling_corr")(spark, dir).collect()
    rows.length shouldBe daily.length
    rows.zipWithIndex.foreach { case (r, i) =>
      r.getTimestamp(0) shouldBe daily(i)._1
      if (i < 6) r.isNullAt(r.fieldIndex("r")) shouldBe true // partial window
      else {
        val win = daily.slice(i - 6, i + 1)
        val (n, sx, sy) = (7L, win.map(_._2).sum, win.map(_._3).sum)
        val sxx = win.map(w => BigInt(w._2) * BigInt(w._2)).sum
        val syy = win.map(w => BigInt(w._3) * BigInt(w._3)).sum
        val sxy = win.map(w => BigInt(w._2) * BigInt(w._3)).sum
        val denx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
        val deny = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
        if (denx > 0 && deny > 0) {
          val exp = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
            math.sqrt(denx * deny)
          r.getDouble(r.fieldIndex("r")) shouldBe exp
          math.abs(exp) should be <= 1.0 + 1e-12
        } else r.isNullAt(r.fieldIndex("r")) shouldBe true
      }
    }
  }

  test("win_bollinger: band stats recompute from a first-principles trailing-8 walk; partial frames stay NULL") {
    val small = "/root/testdata/sf0.001"
    val byUser = Tables(spark, small, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull
        && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), epochUs(r.get(1)), r.getLong(2),
        centsOf(r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    val rows = SparkEntry.queries("win_bollinger")(spark, small).collect()
    rows should not be empty
    rows.foreach { r =>
      val seq = byUser(r.getLong(r.fieldIndex("user_id")))
      val i = seq.indexWhere(_._3 == r.getLong(r.fieldIndex("event_id")))
      if (i < 7) {
        r.isNullAt(r.fieldIndex("mean_cents")) shouldBe true
        r.isNullAt(r.fieldIndex("outlier")) shouldBe true
      } else {
        val frame = seq.slice(i - 7, i + 1).map(_._4)
        val sx = frame.sum
        val sxx = frame.map(x => BigInt(x) * BigInt(x)).sum
        val mean = sx.toDouble / 8
        val varc = math.max((sxx.toDouble - sx.toDouble * sx.toDouble / 8) / 7, 0.0)
        r.getDouble(r.fieldIndex("mean_cents")) shouldBe mean
        r.getDouble(r.fieldIndex("std_cents")) shouldBe math.sqrt(varc)
        r.getBoolean(r.fieldIndex("outlier")) shouldBe
          (math.abs(frame.last.toDouble - mean) > 2.0 * math.sqrt(varc))
      }
    }
  }

  test("churn_rate: every weekly cell recomputes from first-principles presence sets and the censored week is excluded") {
    val uw = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        date_trunc("week", col("ts").cast("timestamp")).as("week"))
      .collect().map(r => (r.getLong(0), epochUs(r.get(1)))).toSet
    val weeks = uw.map(_._2).toSeq.sorted
    val lastWeek = weeks.max
    val rows = SparkEntry.queries("churn_rate")(spark, dir).collect()
    rows should not be empty
    rows.map(r => epochUs(r.get(0))).max should be < lastWeek // censored week out
    rows.foreach { r =>
      val w = epochUs(r.get(0))
      val active = uw.filter(_._2 == w).map(_._1)
      val retained = active.count(u => uw.contains((u, w + 7L * 86400000000L)))
      r.getLong(r.fieldIndex("n_active")) shouldBe active.size.toLong
      r.getLong(r.fieldIndex("n_retained")) shouldBe retained.toLong
      r.getLong(r.fieldIndex("n_churned")) shouldBe (active.size - retained).toLong
      r.getLong(r.fieldIndex("churn_bp")) shouldBe
        (active.size - retained).toLong * 10000 / active.size
    }
  }

  test("vocab_growth: the curve recomputes from a first-principles shingle walk and saturates toward the full vocabulary") {
    val raw = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val lo = raw.map(_._1).min
    val hi = raw.map(_._1).max
    def shingles(text: String): Seq[String] = {
      val w = text.split(" ", -1).toSeq
      (0 until math.max(w.length - 4, 1)).map(i => w.slice(i, i + 5).mkString(" "))
    }
    val shingled = raw.map { case (id, text) =>
      ((id - lo) * 10 / (hi - lo + 1), shingles(text))
    }
    val entry = scala.collection.mutable.Map.empty[String, Long]
    shingled.sortBy(_._1).foreach { case (d, sh) =>
      sh.foreach(s => if (!entry.contains(s)) entry(s) = d
        else if (entry(s) > d) entry(s) = d)
    }
    val rows = SparkEntry.queries("vocab_growth")(spark, dir).collect()
    rows should not be empty
    var cum = 0L
    rows.foreach { r =>
      val d = r.getLong(r.fieldIndex("decile"))
      r.getLong(r.fieldIndex("n_docs")) shouldBe shingled.count(_._1 == d).toLong
      r.getLong(r.fieldIndex("n_tri")) shouldBe
        shingled.filter(_._1 == d).map(_._2.size.toLong).sum
      r.getLong(r.fieldIndex("new_types")) shouldBe entry.values.count(_ == d).toLong
      cum += r.getLong(r.fieldIndex("new_types"))
      r.getLong(r.fieldIndex("cum_types")) shouldBe cum
    }
    cum shouldBe entry.size.toLong // the curve ends at the full vocabulary
    // word-soup corpus: later deciles still discover, but less than decile 0
    rows.last.getLong(rows.last.fieldIndex("new_types")) should be <
      rows.head.getLong(rows.head.fieldIndex("new_types"))
  }

  test("embed_drift: halves partition each language's vectors and the cosine is Cauchy-Schwarz-bounded") {
    val rows = SparkEntry.queries("embed_drift")(spark, dir).collect()
    rows should not be empty
    // first principles: per-lang vector count (64-dim contract filter)
    val perLang = Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64)
      .join(Tables(spark, dir, "documents").select(col("doc_id"), col("lang")),
        col("vec_id") === col("doc_id"))
      .groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val lang = Option(r.getString(0))
      withClue(s"lang $lang: ") {
        val (na, nb) = (r.getLong(1), r.getLong(2))
        na should be > 0L
        nb should be > 0L
        (na + nb) shouldBe perLang(lang)
        // exact-decimal dot/norms => |cos| <= 1 up to one double rounding
        math.abs(r.getDouble(3)) should be <= 1.0 + 1e-12
      }
    }
  }

  test("tpch_q1: the SQL-text form reproduces the DataFrame-API agg_group report bit-for-bit") {
    val sql = SparkEntry.queries("tpch_q1")(spark, dir).collect().map(_.toSeq)
    val api = SparkEntry.queries("agg_group")(spark, dir).collect().map(_.toSeq)
    sql should not be empty
    sql shouldBe api
  }

  test("code_switch: prediction matches lang_id, and scores/ratio/flag recompute from raw text") {
    val langId = SparkEntry.queries("lang_id")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val texts = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val profiles = Seq( // the op's own profile table (Text.langProfiles)
      "en" -> Seq(" th", "he ", " an", "nd ", " of"),
      "de" -> Seq("der", "und", "ie ", "ch ", "ein"),
      "fr" -> Seq(" le", "es ", " de", "ait", "que"),
      "es" -> Seq(" el", " la", "os ", "ión", "ent"),
      "zh" -> Seq("的", "是", "在", "了", "我"))
    def score(text: String, gs: Seq[String]): Long =
      gs.map(g => ((text.length - text.replace(g, "").length) / g.length).toLong).sum
    val rows = SparkEntry.queries("code_switch")(spark, dir).collect()
    rows.length shouldBe texts.size
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val text = texts(id)
      val scores = profiles.map { case (l, gs) => l -> score(text, gs) }
      val pred = r.getString(r.fieldIndex("pred_lang"))
      val sBest = r.getLong(r.fieldIndex("s_best"))
      val sAlt = r.getLong(r.fieldIndex("s_alt"))
      withClue(s"doc $id: ") {
        pred shouldBe langId(id) // the screen scores the classifier it audits
        sBest shouldBe scores.map(_._2).max
        sAlt shouldBe scores.filter(_._1 != pred).map(_._2).max
        // runner-up = first profile-order lang (≠ pred) attaining s_alt
        r.getString(r.fieldIndex("alt_lang")) shouldBe
          scores.filter(_._1 != pred).find(_._2 == sAlt).get._1
        r.getLong(r.fieldIndex("mix_bp")) shouldBe
          (if (sBest + sAlt > 0) sAlt * 10000 / (sBest + sAlt) else 0L)
        r.getBoolean(r.fieldIndex("mixed")) shouldBe (sAlt * 2 >= sBest && sAlt > 0)
      }
    }
  }

  test("boilerplate_detect: a crafted corpus with known site furniture is flagged exactly; the fixture corpus has none (positive path proven synthetically)") {
    import spark.implicits._
    // source A: 5 docs sharing an 8-word footer (df 5/5 = 100% ≥ 20%)
    // appended to unique bodies; source B: unique docs only. The footer
    // contributes exactly 4 boilerplate 5-shingles per doc... plus the
    // bridge shingles that span body|footer, which are unique per doc.
    val footer = "visit our site for more terms and conditions"
    val aDocs = (1L to 5L).map(i =>
      (i, s"alpha$i beta$i gamma$i delta$i epsilon$i $footer", "en", "A", 0L))
    val bDocs = (6L to 10L).map(i =>
      (i, s"zeta$i eta$i theta$i iota$i kappa$i lambda$i", "en", "B", 0L))
    val docs = (aDocs ++ bDocs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.Audit.boilerView(docs,
      graft.ops.Audit.boilerDfGrid(docs),
      graft.ops.Audit.boilerDocsGrid(docs)).collect()
    out.length shouldBe 10
    def sh(text: String): Seq[String] = {
      val w = text.split(" ").toSeq
      (0 until math.max(w.length - 4, 1)).map(i => w.slice(i, i + 5).mkString(" "))
    }
    // shared shingles across source A = exactly the footer-internal ones
    val aTexts = aDocs.map(_._2)
    val shared = aTexts.map(sh(_).toSet).reduce(_ intersect _)
    shared should not be empty // the crafted furniture is really shared
    out.filter(_.getString(1) == "A").foreach { r =>
      val text = aTexts(r.getLong(0).toInt - 1)
      withClue(s"doc ${r.getLong(0)}: ") {
        r.getLong(r.fieldIndex("n_sh")) shouldBe sh(text).size.toLong
        r.getLong(r.fieldIndex("n_bp")) shouldBe
          sh(text).count(shared.contains).toLong
        r.getLong(r.fieldIndex("n_bp")) should be > 0L
        r.getBoolean(r.fieldIndex("flagged")) shouldBe
          (r.getLong(r.fieldIndex("n_bp")) * 10 >= r.getLong(r.fieldIndex("n_sh")) * 3)
      }
    }
    // source B has no cross-doc repetition → zero boilerplate, unflagged
    out.filter(_.getString(1) == "B").foreach { r =>
      r.getLong(r.fieldIndex("n_bp")) shouldBe 0L
      r.getBoolean(r.fieldIndex("flagged")) shouldBe false
    }
    // and the REAL fixture carries none (word-soup shingles never reach
    // 20% doc frequency) — the screen's null result is itself asserted
    val fx = SparkEntry.queries("boilerplate_detect")(spark, dir).collect()
    fx should not be empty
    fx.foreach(r => r.getLong(r.fieldIndex("n_bp")) shouldBe 0L)
  }

  test("rrf_eval: the full-rank reference list recomputes driver-side and doc_short is exactly the shipped search_rrf top-10") {
    val rows = SparkEntry.queries("rrf_eval")(spark, dir).collect()
    rows.map(_.getInt(0)).sorted.toSeq shouldBe (1 to 10)
    val shipped = SparkEntry.queries("search_rrf")(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")))
    rows.sortBy(_.getInt(0)).map(_.getLong(1)).toSeq shouldBe shipped.toSeq
    // driver-side full-rank fusion from raw scores
    val docs = Tables(spark, dir, "documents")
      .filter(col("doc_id") =!= 0 && col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val emb = Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.size(col("embedding")) === 64)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qv = emb(0L)
    def kw(t: String) = Seq("table", "scan", "join")
      .map(g => ((t.length - t.replace(g, "").length) / g.length).toLong).sum
    def cos(a: Array[Double]) = {
      // double-precision is ONLY a ranking proxy here; assert agreement
      // on the documents, not on score bits
      val dot = a.zip(qv).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * qv.map(x => x * x).sum)
    }
    val inCorpus = docs.filter { case (id, _) => emb.contains(id) }
    val rKw = inCorpus.map { case (id, t) => id -> kw(t) }
      .sortBy { case (id, s2) => (-s2, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val rVec = inCorpus.map { case (id, _) => id -> cos(emb(id)) }
      .sortBy { case (id, s2) => (-s2, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val full = inCorpus.map(_._1).map(id =>
        id -> (1.0 / (60 + rKw(id)) + 1.0 / (60 + rVec(id))))
      .sortBy { case (id, s2) => (-s2, id) }.take(10).map(_._1)
    rows.sortBy(_.getInt(0)).map(_.getLong(2)).toSeq shouldBe full.toSeq
  }

  test("ab_sequential: the running z and OF boundary recompute from a first-principles cumulative walk") {
    val ev = Tables(spark, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull
        && col("event_type").isin("click", "purchase"))
      .select(date_trunc("day", col("ts")).cast("timestamp").as("day"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (epochUs(r.get(0)), r.getString(1), BigDecimal(r.getDouble(2))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val days = ev.map(_._1).distinct.sorted
    val rows = SparkEntry.queries("ab_sequential")(spark, dir).collect()
    rows should not be empty
    var lastBound = Double.MaxValue
    rows.foreach { r =>
      val day = epochUs(r.get(0))
      val tIdx = days.indexOf(day) + 1
      val upTo = ev.filter(_._1 <= day)
      def arm(t: String) = upTo.filter(_._2 == t).map(_._3)
      val (a, b) = (arm("click"), arm("purchase"))
      withClue(s"day $day: ") {
        r.getLong(r.fieldIndex("n_a")) shouldBe a.size.toLong
        r.getLong(r.fieldIndex("n_b")) shouldBe b.size.toLong
        def mv(x: Seq[BigDecimal]) = {
          val n = x.size
          val m = (x.sum / n).toDouble
          val v = x.map(d => math.pow(d.toDouble - m, 2)).sum / (n - 1)
          (m, v)
        }
        val (ma, va) = mv(a); val (mb, vb) = mv(b)
        val z = (ma - mb) / math.sqrt(va / a.size + vb / b.size)
        r.getDouble(r.fieldIndex("z")) shouldBe z +- (math.abs(z) * 1e-9 + 1e-9)
        val bound = 2.7965 / math.sqrt(tIdx.toDouble / days.size)
        r.getDouble(r.fieldIndex("bound")) shouldBe bound +- 1e-12
        // the boundary decays monotonically toward the horizon constant
        bound should be <= lastBound
        lastBound = bound
        r.getBoolean(r.fieldIndex("crossed")) shouldBe
          (math.abs(r.getDouble(r.fieldIndex("z"))) > r.getDouble(r.fieldIndex("bound")))
      }
    }
    // at the horizon the boundary IS the OF constant
    lastBound shouldBe 2.7965 +- 1e-12
  }

  test("curation_report: sequential gate attribution recomputes from a first-principles walk over raw documents") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
    def pregate(text: Option[String]): Option[String] = text match {
      case None => Some("null_text")
      case Some(t) =>
        val w = t.split(" ", -1).toSeq
        val grams = (0 until math.max(w.length - 1, 1))
          .map(i => w.slice(i, i + 2).mkString(" "))
        if (w.length < 10) Some("too_short")
        else if (w.length > 2000) Some("too_long")
        else if ((grams.size - grams.distinct.size) * 10 > grams.size)
          Some("repetitive")
        else None
    }
    val seen = scala.collection.mutable.Set[String]()
    val expected = docs.sortBy(_._1).map { case (_, src, text) =>
      val g = pregate(text) match {
        case Some(gate) => gate
        case None =>
          if (seen.add(text.get)) "kept" else "duplicate"
      }
      (src, g)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val rows = SparkEntry.queries("curation_report")(spark, dir).collect()
    rows should not be empty
    rows.map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2))
      .toMap shouldBe expected
    rows.foreach { r =>
      val src = Option(r.getString(0))
      r.getLong(r.fieldIndex("share_bp")) shouldBe
        r.getLong(r.fieldIndex("n")) * 10000 / totals(src)
    }
    // every doc is attributed to exactly one gate
    rows.map(_.getLong(2)).sum shouldBe docs.length.toLong
  }

  test("pii_report: incidence recomputes from pii_redact's own per-doc counts — the report provably measures what the redactor redacts") {
    val perDoc = SparkEntry.queries("pii_redact")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val srcOf = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
    val rows = SparkEntry.queries("pii_report")(spark, dir).collect()
    rows should not be empty
    val bySrc = srcOf.groupBy(_._2)
    rows.foreach { r =>
      val src = Option(r.getString(0))
      val sel: ((Int, Int, Int)) => Int = r.getString(1) match {
        case "email" => _._1
        case "ip" => _._2
        case "number" => _._3
      }
      val counts = bySrc(src).map { case (id, _) => sel(perDoc(id)) }
      withClue(s"source $src / ${r.getString(1)}: ") {
        r.getLong(r.fieldIndex("n_docs_hit")) shouldBe counts.count(_ > 0).toLong
        r.getLong(r.fieldIndex("n_matches")) shouldBe counts.map(_.toLong).sum
        r.getLong(r.fieldIndex("hit_bp")) shouldBe
          counts.count(_ > 0).toLong * 10000 / counts.size
      }
    }
    // the fixture word soup carries NO PII — that null result is itself
    // asserted, and the positive path is proven on a crafted corpus
    rows.map(r => r.getLong(r.fieldIndex("n_matches"))).sum shouldBe 0L
    import spark.implicits._
    val crafted = Seq(
      (1L, "contact bob@example.com or sue@corp.io today", "en", "A", 0L),
      (2L, "server 10.0.0.1 then 192.168.1.254 responded", "en", "A", 0L),
      (3L, "order 1234567 ref 99887766 and 42", "en", "B", 0L),
      (4L, "nothing sensitive here at all", "en", "B", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.Pipeline.piiView(graft.ops.Pipeline.piiGrid(crafted))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out(("A", "email")) shouldBe ((1L, 2L, 5000L)) // 1 of 2 docs, 2 matches
    out(("A", "ip")) shouldBe ((1L, 2L, 5000L))
    out(("A", "number")) shouldBe ((0L, 0L, 0L))
    out(("B", "number")) shouldBe ((1L, 2L, 5000L)) // 42 is too short
    out(("B", "email")) shouldBe ((0L, 0L, 0L))
  }

  test("experiment_dashboard: legs equal the standalone ops and the decision recomputes from the flags") {
    val dash = SparkEntry.queries("experiment_dashboard")(spark, dir).collect()
    def byDay(name: String) = SparkEntry.queries(name)(spark, dir).collect()
      .map(r => epochUs(r.get(r.fieldIndex("day"))) -> r).toMap
    val srm = byDay("ab_srm"); val tt = byDay("ab_ttest"); val rs = byDay("ab_ranksum")
    dash.map(r => epochUs(r.get(0))).toSet shouldBe srm.keySet // SRM is the spine
    dash.foreach { r =>
      val day = epochUs(r.get(0))
      withClue(s"day $day: ") {
        val s = srm(day)
        r.getLong(r.fieldIndex("n_a")) shouldBe s.getLong(s.fieldIndex("n_a"))
        r.getDouble(r.fieldIndex("srm_chi2")) shouldBe s.getDouble(s.fieldIndex("chi2"))
        val srmFlag = r.getBoolean(r.fieldIndex("srm"))
        srmFlag shouldBe s.getBoolean(s.fieldIndex("srm"))
        val tRow = tt.get(day)
        val tSig = tRow.exists(x => x.getBoolean(x.fieldIndex("significant")))
        tRow match {
          case Some(x) =>
            r.getDouble(r.fieldIndex("t_stat")) shouldBe
              x.getDouble(x.fieldIndex("t_stat"))
          case None => r.isNullAt(r.fieldIndex("t_stat")) shouldBe true
        }
        val rRow = rs.get(day)
        val zSig = rRow.exists(x => x.getBoolean(x.fieldIndex("significant")))
        rRow match {
          case Some(x) =>
            r.getDouble(r.fieldIndex("z")) shouldBe x.getDouble(x.fieldIndex("z"))
          case None => r.isNullAt(r.fieldIndex("z")) shouldBe true
        }
        r.getString(r.fieldIndex("decision")) shouldBe (
          if (srmFlag) "invalid"
          else if (tSig && zSig) "effect"
          else if (tSig || zSig) "review"
          else "no_effect")
      }
    }
  }

  test("benford_second: second digits, counts and chi2 recompute from first-principles cents arithmetic") {
    val events = Tables(spark, dir, "events")
      .select("event_type", "value").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getDouble(1)))
    val digits = events.flatMap { case (t, v) =>
      val cents = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
      val s = math.abs(cents).toString
      if (cents == 0 || s.length < 2) None // one-digit amounts: no d2
      else Some((t, s.charAt(1).asDigit))
    }
    val expBp = Seq(1197, 1139, 1088, 1043, 1003, 967, 934, 903, 876, 850)
    expBp.sum shouldBe 10000 // largest-remainder apportionment: full partition
    val byType = digits.groupBy(_._1)
    val got = SparkEntry.queries("benford_second")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getBoolean(8))).toMap
    got.keySet shouldBe byType.keySet.flatMap(t => (0 to 9).map(t -> _))
    byType.foreach { case (typ, rows) =>
      val n = rows.length.toLong
      val terms = (0 to 9).map { dg =>
        val o = rows.count(_._2 == dg).toLong
        val e = expBp(dg)
        val num = (10000L * o - n * e).toDouble
        val term = BigDecimal(num * num / (10000d * n.toDouble * e.toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (dg, o, term)
      }
      val chi2 = terms.map(_._3).sum.toDouble
      terms.foreach { case (dg, o, _) =>
        withClue(s"($typ, $dg): ") {
          got((typ, dg)) shouldBe ((o, n, o * 10000 / n, expBp(dg).toLong,
            o * 10000 / n - expBp(dg), chi2, chi2 > 16.919))
        }
      }
    }
  }

  test("curation_cost_curve: the curve recomputes from the same first-principles gate walk, and its identities hold") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    def pregate(text: Option[String]): Option[String] = text match {
      case None => Some("null_text")
      case Some(t) =>
        val w = t.split(" ", -1).toSeq
        val grams = (0 until math.max(w.length - 1, 1))
          .map(i => w.slice(i, i + 2).mkString(" "))
        if (w.length < 10) Some("too_short")
        else if (w.length > 2000) Some("too_long")
        else if ((grams.size - grams.distinct.size) * 10 > grams.size)
          Some("repetitive")
        else None
    }
    def tok(text: Option[String]): Long =
      text.map(_.split(" ", -1).length.toLong).getOrElse(0L)
    val seen = scala.collection.mutable.Set[String]()
    val walked = docs.sortBy(_._1).map { case (_, text) =>
      val g = pregate(text).getOrElse(
        if (seen.add(text.get)) "kept" else "duplicate")
      (g, tok(text))
    }
    val total = walked.length.toLong
    val totalTok = walked.map(_._2).sum
    val drops = walked.filter(_._1 != "kept")
      .groupBy(_._1).view.mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val stages = Seq("null_text", "too_short", "too_long", "repetitive", "duplicate")
    val rows = SparkEntry.queries("curation_cost_curve")(spark, dir)
      .collect().sortBy(_.getInt(0))
    rows.map(_.getString(1)).toSeq shouldBe stages // literal scaffold, in order
    var cumN = 0L; var cumTok = 0L
    rows.zip(stages).foreach { case (r, g) =>
      val (nD, tD) = drops.getOrElse(g, (0L, 0L))
      cumN += nD; cumTok += tD
      withClue(s"stage $g: ") {
        r.getLong(r.fieldIndex("n_drop")) shouldBe nD
        r.getLong(r.fieldIndex("tok_drop")) shouldBe tD
        r.getLong(r.fieldIndex("n_left")) shouldBe (total - cumN)
        r.getLong(r.fieldIndex("tok_left")) shouldBe (totalTok - cumTok)
        r.getLong(r.fieldIndex("left_bp")) shouldBe (total - cumN) * 10000 / total
        r.getLong(r.fieldIndex("cost_bp")) shouldBe total * 10000 / (total - cumN)
      }
    }
    // terminal identity: what's left after the last gate IS the kept set
    rows.last.getLong(rows.last.fieldIndex("n_left")) shouldBe
      walked.count(_._1 == "kept").toLong
    // the curve only ever loses documents
    rows.map(r => r.getLong(r.fieldIndex("n_left"))).toSeq shouldBe
      rows.map(r => r.getLong(r.fieldIndex("n_left"))).toSeq.sorted.reverse
  }

  test("win_drawdown: the running peak-to-balance fold recomputes from a first-principles replay in exact cents") {
    val events = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(3))
      .map(r => (r.getLong(0), epochUs(r.get(1)), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val expected = events.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var peak = Long.MinValue; var dd = Long.MinValue
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, cents) =>
        bal += cents
        peak = math.max(peak, bal)
        dd = math.max(dd, peak - bal)
      }
      u -> ((rows.length.toLong, bal, peak, dd,
        if (peak > 0) Some(dd * 10000 / peak) else None))
    }
    val rows = SparkEntry.queries("win_drawdown")(spark, dir).collect()
    rows should not be empty
    rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap shouldBe expected
    // drawdown is never negative and never exceeds the peak-minus-minimum
    rows.foreach(r => r.getLong(4) should be >= 0L)
  }

  test("benford_mad: both test statistics and their conformity bands recompute from raw cents, and the band decision is exact integer arithmetic") {
    val events = Tables(spark, dir, "events")
      .select("event_type", "value").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getDouble(1)))
    val centsStr = events.flatMap { case (t, v) =>
      val cents = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
      if (cents == 0) None else Some((t, math.abs(cents).toString))
    }
    val exp1 = Seq(3010, 1761, 1249, 969, 792, 669, 580, 512, 458)
    val exp2 = Seq(1197, 1139, 1088, 1043, 1003, 967, 934, 903, 876, 850)
    def legExpected(digits: Seq[(String, Int)], exp: Seq[Int], lo: Int,
        bands: Seq[Int], d: Int) =
      digits.groupBy(_._1).map { case (t, rows) =>
        val n = rows.length.toLong
        val sumAdev = (lo until lo + d).map { dg =>
          val o = rows.count(_._2 == dg).toLong
          math.abs(10000L * o - n * exp(dg - lo))
        }.sum
        val band =
          if (sumAdev < bands(0).toLong * n * d) "close"
          else if (sumAdev < bands(1).toLong * n * d) "acceptable"
          else if (sumAdev < bands(2).toLong * n * d) "marginal"
          else "nonconformity"
        (t, (n, sumAdev, band))
      }
    val first = legExpected(centsStr.map { case (t, s) => (t, s.charAt(0).asDigit) },
      exp1, 1, Seq(60, 120, 150), 9)
    val second = legExpected(
      centsStr.filter(_._2.length >= 2).map { case (t, s) => (t, s.charAt(1).asDigit) },
      exp2, 0, Seq(80, 100, 120), 10)
    val rows = SparkEntry.queries("benford_mad")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (t, test) = (r.getString(0), r.getString(1))
      val (n, sumAdev, band) = (if (test == "first") first else second)(t)
      withClue(s"($t, $test): ") {
        r.getLong(2) shouldBe n
        r.getLong(3) shouldBe sumAdev
        r.getDouble(4) shouldBe sumAdev.toDouble / (10000d * n *
          (if (test == "first") 9 else 10))
        r.getString(5) shouldBe band
      }
    }
    rows.count(_.getString(1) == "first") shouldBe first.size
    rows.count(_.getString(1) == "second") shouldBe second.size
  }

  test("dedup_profile: the duplication histogram recomputes from raw text clusters, and its identities reconcile with dedup_exact") {
    val texts = Tables(spark, dir, "documents")
      .select("text").collect().map(r => Option(r.getString(0)))
    val sizes = texts.groupBy(identity).values.map(_.length.toLong).toSeq
    val total = texts.length.toLong
    val expected = sizes.groupBy(identity).map { case (k, g) =>
      val nc = g.length.toLong
      k -> ((nc, k * nc, k * nc * 10000 / total,
        (k - 1) * nc, (k - 1) * nc * 10000 / total))
    }
    val rows = SparkEntry.queries("dedup_profile")(spark, dir).collect()
    rows should not be empty
    rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))).toMap shouldBe expected
    // reconciliation: corpus = Σ n_docs; dedup_exact survivors = Σ clusters
    rows.map(_.getLong(2)).sum shouldBe total
    rows.map(_.getLong(1)).sum shouldBe
      SparkEntry.queries("dedup_exact")(spark, dir).count()
  }

  test("route_quality: every lane recomputes from quality_score x lang_id's own per-doc outputs — the matrix provably crosses the published signals") {
    val nonNull = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val qOf = SparkEntry.queries("quality_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality"))).toMap
    val pOf = SparkEntry.queries("lang_id")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val expected = nonNull.toSeq.map { case (id, src) =>
      ((src, pOf(id)), qOf(id))
    }.groupBy(_._1).map { case (k, g) =>
      val n = g.length.toLong
      // the op quantizes each composite to DECIMAL(18,4) HALF_UP before
      // the order-free sum (both engines) — replay the same quantize
      val qsum = g.map(x =>
        BigDecimal(x._2).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      val nLow = g.count(_._2 < 0.5).toLong
      k -> ((n, qsum.toDouble / n, nLow, nLow * 10000 / n))
    }
    val rows = SparkEntry.queries("route_quality")(spark, dir).collect()
    rows should not be empty
    rows.map(r => (Option(r.getString(0)), r.getString(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))))
      .toMap shouldBe expected
  }

  test("lang_routing: every cell recomputes from code_switch's per-doc screen — the router provably agrees with the mixing audit") {
    val srcOf = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)),
        r.getString(2).split(" ", -1).length.toLong))).toMap
    val screen = SparkEntry.queries("code_switch")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2),
        r.getBoolean(r.fieldIndex("mixed"))))
    val expected = screen.groupBy { case (id, pred, _) => (srcOf(id)._1, pred) }
      .map { case (k, g) =>
        k -> ((g.length.toLong, g.map(x => srcOf(x._1)._2).sum,
          g.count(_._3).toLong))
      }
    val rows = SparkEntry.queries("lang_routing")(spark, dir).collect()
    rows should not be empty
    rows.map(r => (Option(r.getString(0)), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap shouldBe expected
    // share identities per source: integer-bp shares sum to 10000 less
    // only div truncation (< one bp per cell)
    rows.groupBy(r => Option(r.getString(0))).foreach { case (src, g) =>
      val srcN = g.map(_.getLong(2)).sum
      g.foreach { r =>
        r.getLong(r.fieldIndex("share_bp")) shouldBe r.getLong(2) * 10000 / srcN
        r.getLong(r.fieldIndex("mixed_bp")) shouldBe
          r.getLong(4) * 10000 / r.getLong(2)
      }
      val shareIdx = g.head.fieldIndex("share_bp")
      val shareSum = g.map(_.getLong(shareIdx)).sum
      withClue(s"source $src share sum: ") {
        shareSum should be <= 10000L
        shareSum should be > (10000L - g.length)
      }
    }
  }
}
