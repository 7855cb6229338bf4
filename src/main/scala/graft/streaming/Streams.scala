package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event-time ops in
  * `graft.ops.Events` (SURVEY §2.B "Streaming-shaped ops" design note).
  *
  * Each takes an unbounded streaming DataFrame with the `events` schema
  * (event_id long, user_id long, event_type string, ts timestamp, value
  * double, props string) and returns a streaming DataFrame; callers attach
  * `writeStream` with their own sink/trigger. Event-time correctness comes
  * from watermarks: state for windows/sessions/dedup older than the
  * watermark is dropped, which is what bounds state size on an unbounded
  * 100 TB/day stream — without it every variant below would accumulate
  * state forever.
  *
  * The batch twins in `ops.Events` share the same window semantics
  * (window/session_window/dropDuplicates), so the oracle-checked batch
  * results pin the streaming semantics too; these are unit-tested with
  * MemoryStream (not oracle-checkable — SURVEY §5.2 #4).
  */
object Streams {

  /** Decimal-exact value sum — the shared [[graft.ops.dsum]] the batch
    * twins aggregate with: double partials combine in micro-batch arrival
    * order, so a raw double sum would make stream-vs-batch parity
    * float-order-dependent. */
  private def dsumV = graft.ops.dsum(col("value")).as("sum_value")

  /** Event-time normalization: watermarks REQUIRE an instant-typed column
    * (Spark rejects TIMESTAMP_NTZ event time outright), but the fixture
    * parquet surfaces `ts` as NTZ. The cast interprets NTZ wall time in the
    * session timezone (pinned UTC engine-wide) — a no-op when the input is
    * already instant-typed, and value-faithful when it isn't. Applied at
    * every watermark site so callers can hand either type to any twin. */
  private def instantTs(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast("timestamp"))

  /** Tumbling 1h windows per event_type (twin of stream_tumbling). */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1h windows every 15 minutes (twin of stream_sliding). */
  def sliding(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per user, 30 min gap (twin of stream_session).
    * Sessions close once the watermark passes their end — append-mode output.
    */
  def session(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("sum_value"))

  /** Drop duplicate events by event_id within the watermark horizon (twin of
    * stream_dedup). `dropDuplicatesWithinWatermark` keeps state only for the
    * watermark window — bounded state for an unbounded stream. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Rate limiting (twin of the batch stream_throttle op): at most one
    * event per (user, 5-minute bucket) within the watermark horizon.
    * State = one row per active (user, bucket) key, expired once the
    * watermark passes the bucket — bounded on an unbounded stream.
    * WHICH representative survives is arrival-order-dependent here
    * (dropDuplicates keeps the first-arrived); the batch twin pins the
    * (ts, event_id)-minimum. The invariant both share — and what the
    * parity test asserts — is the KEY SET: exactly one survivor per
    * (user, bucket) that has any event. */
  def throttle(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      .withColumn("ws", window(col("ts"), "5 minutes").getField("start"))
      .dropDuplicatesWithinWatermark("user_id", "ws")
      .select("event_id", "user_id", "ws")

  /** One micro-batch's (window-start, type) counts — the algebraic
    * partial the top-k state merges (twin of the batch stream_topk op's
    * aggregate stage). */
  private[streaming] def topkCounts(batch: DataFrame): DataFrame =
    instantTs(batch)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Merge a batch's count partials into the state: counts are algebraic,
    * so merge = SUM on the (ws, event_type) key — redelivery is NOT
    * idempotent for raw counts, so callers pair this with exactly-once
    * batch tracking (the FileStreamParitySpec drive relies on
    * foreachBatch's per-epoch batchId). */
  def topkMergeCounts(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.ws") === col("d.ws")
        && col("s.event_type") === col("d.event_type"), "full_outer")
      .select(coalesce(col("d.ws"), col("s.ws")).as("ws"),
        coalesce(col("d.event_type"), col("s.event_type")).as("event_type"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"))
  }

  /** Streaming per-window top-k (twin of the batch stream_topk op):
    * foreachBatch folds each micro-batch's count partials into a
    * (ws, type, n) state table — bounded by |windows × types|, never
    * stream volume — and [[topkView]] ranks that bounded state. Rank
    * over an agg isn't expressible as one streaming plan in append
    * mode; state-fold + view is the standard decomposition. */
  def topkSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(topkMergeCounts(readState(), topkCounts(batch)))
    }

  /** Read side of [[topkSink]]: the top-k types per window over the
    * bounded count state — same rank/tiebreak as the batch op. */
  def topkView(state: DataFrame, k: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ws").orderBy(col("n").desc, col("event_type").asc)
    state.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Stream-stream interval join (twin of the batch stream_interval_join):
    * purchases matched to the same user's clicks in the preceding
    * `window`. BOTH sides carry watermarks and the join condition bounds
    * event time in both directions — that pair of constraints is what lets
    * Structured Streaming expire buffered rows (click state older than
    * watermark + window drops), keeping state bounded on unbounded inputs.
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
      window: String = "10 minutes", watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val c = instantTs(clicks).withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val p = instantTs(purchases).withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
    // joinType=left_outer emits unmatched purchases (NULL click) once the
    // watermark proves no qualifying click can still arrive
    p.join(c, col("p_user") === col("c_user")
        && col("cts") <= col("pts")
        && col("cts") > col("pts") - expr(s"INTERVAL $window"), joinType)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        // µs-difference-then-div: bit-identical to the batch twin
        expr("(unix_micros(cast(pts as timestamp)) "
          + "- unix_micros(cast(cts as timestamp))) div 1000").as("delay_ms"))
  }

  /** Stream→table upsert: apply the engine's keyed last-writer-wins merge
    * ([[graft.engine.Sinks.upsert]], reference R13 semantics) to every
    * micro-batch via foreachBatch. `readTable`/`writeTable` abstract the
    * destination (parquet dir, Delta-style table, JDBC stage+merge) so the
    * merge SEMANTICS live here and the storage commit lives with the
    * caller. Each micro-batch is one distributed merge plan — the streaming
    * generalization of the reference's batched upsert loop, minus its
    * partial-commit failure mode (task commit is atomic per batch).
    */
  def upsertSink(incoming: DataFrame, keys: Seq[String], orderCol: String)(
      readTable: () => DataFrame)(writeTable: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeTable(graft.engine.Sinks.upsert(readTable(), batch, keys, orderCol))
    }

  /** Per-key winners of one CDC micro-batch in (ts, event_id) order —
    * the same last-writer-wins collapse the batch twin (`ops.Events`
    * `cdc_apply`) runs over the whole log. 'error' events are DELETES,
    * kept as tombstones (not dropped): the version they carry is what
    * stops an out-of-order older upsert from resurrecting the key. */
  private[streaming] def cdcWinners(batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    batch.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id").as("k"),
        (col("event_type") === "error").as("deleted"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"),
        col("ts").as("wts"), col("event_id").as("wid"))
  }

  /** Streaming CDC apply (twin of the batch `cdc_apply` op): maintain a
    * versioned key→value state table under an unbounded change stream.
    * Each micro-batch collapses to per-key winners, then merges into the
    * state by VERSION comparison — a state row only changes if the batch
    * winner's (ts, event_id) is strictly newer. That comparison is what
    * makes the sink correct beyond the happy path: micro-batches need not
    * arrive in event-time order (a late batch carrying an older change is
    * a no-op), and foreachBatch's at-least-once redelivery is idempotent
    * (re-merging an already-applied batch changes nothing). Deletes live
    * in-state as tombstones so they also win/lose by version, never by
    * arrival order. State schema: (k, deleted, v, wts, wid); bounded by
    * the ACTIVE KEY SET, not stream volume — the same growth bound as the
    * batch op's collapsed join side, which is what a 100 TB/day change
    * stream requires of its materialized view.
    */
  def cdcApplySink(changes: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(cdcMerge(readState(), cdcWinners(batch)))
    }

  /** One version-aware merge step: newer (wts, wid) wins per key. Exposed
    * for direct unit-level reuse; `cdcApplySink` drives it per batch. */
  def cdcMerge(state: DataFrame, winners: DataFrame): DataFrame = {
    val s = state.as("s")
    val b = winners.as("b")
    val bNewer = col("s.k").isNull || (col("b.k").isNotNull &&
      struct(col("b.wts"), col("b.wid")) > struct(col("s.wts"), col("s.wid")))
    def pick(c: String) =
      when(bNewer, col(s"b.$c")).otherwise(col(s"s.$c")).as(c)
    s.join(b, col("s.k") === col("b.k"), "full_outer")
      .select(coalesce(col("b.k"), col("s.k")).as("k"),
        pick("deleted"), pick("v"), pick("wts"), pick("wid"))
  }

  /** Materialize the merged view the batch `cdc_apply` op computes: the
    * base snapshot with live state applied — upserts override, tombstones
    * drop the key, untouched base rows pass through. `cdcApplySink` keeps
    * `state` current; this is the read side. */
  def cdcView(base: DataFrame, state: DataFrame): DataFrame =
    base.select(col("c_custkey"),
        col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("cv"))
      .join(state, col("c_custkey") === col("k"), "full_outer")
      .filter(coalesce(col("deleted"), lit(false)) === false)
      .select(coalesce(col("k"), col("c_custkey")).as("k"),
        when(col("k").isNull, col("cv")).otherwise(col("v"))
          .cast("double").as("val"), // match the batch twin's double output
        when(col("k").isNull, "base").otherwise("cdc").as("src"))

  /** Stream → live JDBC destination with keyed upsert: every micro-batch
    * goes through the engine's stage-and-merge
    * ([[graft.engine.Sources.jdbcUpsert]]) — the streaming form of the
    * reference's batched upsert loop (ETLProcess.java:388-427) against a
    * real database endpoint. foreachBatch delivery is at-least-once; the
    * keyed MERGE makes redelivered batches idempotent, which is exactly
    * why the upsert (not append) path is the safe streaming JDBC sink. */
  def jdbcUpsertSink(incoming: DataFrame, cfg: graft.engine.Sources.JdbcConfig,
      table: String, keys: Seq[String], orderCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      graft.engine.Sources.jdbcUpsert(batch, cfg, table, keys, orderCol)
    }

  /** Streaming twin of the batch time_ohlc op: daily OHLC bars per event
    * type as ONE streaming aggregate — the struct-extreme open/close
    * trick carries over verbatim (min/max state over (ts, event_id,
    * value) structs is per-group constant size), so the bar state is
    * |days × types| rows and append mode emits each bar exactly once,
    * when the watermark closes its day. */
  def ohlc(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n"),
        graft.ops.dsum(col("value")).as("volume"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"), col("volume"))

  /** One micro-batch's (user, hour) counts — the algebraic partial the
    * rate-alert state merges (twin of the batch rate_alert's aggregate
    * stage; same integer hour index). */
  private[streaming] def hourCounts(batch: DataFrame): DataFrame =
    instantTs(batch)
      .groupBy(col("user_id"), graft.ops.hourIdx.as("hidx"))
      .agg(count(lit(1)).as("n"))

  /** Merge a batch's hourly count partials into the (user, hidx, n)
    * state — counts are algebraic, so merge = SUM on the key. Same
    * exactly-once caveat as [[topkMergeCounts]]. */
  def rateAlertMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.user_id") === col("d.user_id")
        && col("s.hidx") === col("d.hidx"), "full_outer")
      .select(coalesce(col("d.user_id"), col("s.user_id")).as("user_id"),
        coalesce(col("d.hidx"), col("s.hidx")).as("hidx"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"))
  }

  /** foreachBatch fold for the rate-alert state (twin of the batch
    * rate_alert op): state is bounded by |users × active hours|, never
    * stream volume; [[rateAlertView]] computes the alerts over it. */
  def rateAlertSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(rateAlertMerge(readState(), hourCounts(batch)))
    }

  /** Read side of [[rateAlertSink]]: the trailing-24-calendar-hour
    * baseline compare over the bounded count state — LITERALLY the batch
    * op's view ([[graft.ops.rateAlertOver]]), shared so stream-vs-batch
    * parity cannot drift. */
  def rateAlertView(state: DataFrame): DataFrame =
    graft.ops.rateAlertOver(state)

  /** Per-batch (type, bin) count partials for the drift twin — LITERALLY
    * the batch op's grid pass ([[graft.ops.Stats.driftCounts]]), shared so
    * the two formulations cannot drift. */
  private[streaming] def driftCounts(batch: DataFrame): DataFrame =
    graft.ops.Stats.driftCounts(instantTs(batch))

  /** Merge a batch's drift-grid partials into the (type, bin, c_ref,
    * c_cur) state — the grid is algebraic, so merge = keyed SUM.
    * Null-safe key equality: a NULL event_type is a legitimate audited
    * group in the batch op, so the merge must not fork it into duplicate
    * state rows. Same exactly-once caveat as [[topkMergeCounts]]. */
  def driftMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.event_type") <=> col("d.event_type")
        && col("s.bin") <=> col("d.bin"), "full_outer")
      .select(coalesce(col("d.event_type"), col("s.event_type")).as("event_type"),
        coalesce(col("d.bin"), col("s.bin")).as("bin"),
        (coalesce(col("s.c_ref"), lit(0L)) + coalesce(col("d.c_ref"), lit(0L))).as("c_ref"),
        (coalesce(col("s.c_cur"), lit(0L)) + coalesce(col("d.c_cur"), lit(0L))).as("c_cur"))
  }

  /** foreachBatch fold for the drift-gate state (twin of the batch
    * drift_report op): production drift checks run CONTINUOUSLY against
    * the ingest stream, and the grid state is bounded by
    * |types × bins| (~100 rows), never stream volume. */
  def driftSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(driftMerge(readState(), driftCounts(batch)))
    }

  /** Read side of [[driftSink]]: TVD + χ² over the bounded grid state —
    * LITERALLY the batch op's view ([[graft.ops.Stats.driftView]]). */
  def driftView(state: DataFrame): DataFrame =
    graft.ops.Stats.driftView(state)

  /** Per-batch t-test moment partials — LITERALLY the batch op's moment
    * pass ([[graft.ops.Stats.ttestMoments]]). */
  private[streaming] def ttestMoments(batch: DataFrame): DataFrame =
    graft.ops.Stats.ttestMoments(instantTs(batch))

  /** Merge a batch's moment partials into the per-day (n, Σx, Σx²) state:
    * counts and EXACT DECIMAL sums are algebraic, so merge = keyed SUM —
    * and because the sums are decimals, the merged state is bit-identical
    * no matter how the stream was batched (an IEEE-double running sum
    * would drift with the cut points). Casts pin the state schema the
    * parquet round-trip needs. Same exactly-once caveat as
    * [[topkMergeCounts]]. */
  def ttestMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val s = state.as("s"); val d = delta.as("d")
    def add(c: String, dt: org.apache.spark.sql.types.DataType) =
      (coalesce(col(s"s.$c"), lit(0).cast(dt))
        + coalesce(col(s"d.$c"), lit(0).cast(dt))).cast(dt).as(c)
    s.join(d, col("s.day") <=> col("d.day"), "full_outer")
      .select(Seq(coalesce(col("d.day"), col("s.day")).as("day")) ++
        Seq("a", "b").flatMap { arm =>
          Seq(add(s"n_$arm", org.apache.spark.sql.types.LongType),
            add(s"sx_$arm", DecimalType(38, 2)),
            add(s"sxx_$arm", DecimalType(38, 4)))
        }: _*)
  }

  /** foreachBatch fold for the experiment-significance state (twin of the
    * batch ab_ttest op): A/B dashboards recompute significance as events
    * arrive, and the moment state is bounded by |days|, never stream
    * volume. */
  def ttestSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(ttestMerge(readState(), ttestMoments(batch)))
    }

  /** Read side of [[ttestSink]]: the Welch statistic over the bounded
    * moment state — LITERALLY the batch op's view
    * ([[graft.ops.Stats.ttestView]]). */
  def ttestView(state: DataFrame): DataFrame =
    graft.ops.Stats.ttestView(state)

  /** Second read side of [[ttestSink]] — the always-valid SEQUENTIAL
    * monitor (batch op ab_sequential) reads the SAME moment fold: one
    * state, two monitors (the srmSink/rolling_corr pattern). This is
    * the view a live experiment actually needs — the whole point of a
    * group-sequential boundary is that it stays valid while the fold
    * grows. */
  def seqView(state: DataFrame): DataFrame =
    graft.ops.Stats.seqView(state)

  /** Per-batch calendar-hour count partials — LITERALLY the batch op's
    * fact pass ([[graft.ops.Events.seasonalCounts]]). */
  private[streaming] def seasonalCounts(batch: DataFrame): DataFrame =
    graft.ops.Events.seasonalCounts(instantTs(batch))

  /** Merge a batch's hour-count partials into the (hts, n) state — counts
    * are algebraic, merge = keyed SUM; state is calendar-bounded (24·365
    * rows/yr), never stream volume. Same exactly-once caveat as
    * [[topkMergeCounts]]. */
  def seasonalMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.hts") <=> col("d.hts"), "full_outer")
      .select(coalesce(col("d.hts"), col("s.hts")).as("hts"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"))
  }

  /** foreachBatch fold for the seasonal-anomaly state (twin of the batch
    * anomaly_seasonal op): the load monitor runs continuously and each
    * arriving hour is judged against the hour-of-week cells the fold has
    * accumulated so far. */
  def seasonalSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(seasonalMerge(readState(), seasonalCounts(batch)))
    }

  /** Read side of [[seasonalSink]]: the hour-of-week cell compare —
    * LITERALLY the batch op's view ([[graft.ops.Events.seasonalView]]). */
  def seasonalView(state: DataFrame): DataFrame =
    graft.ops.Events.seasonalView(state)

  /** Per-batch (type, day) cents partials for the changepoint twin —
    * LITERALLY the batch op's grid pass
    * ([[graft.ops.Stats.cusumDaily]]). */
  private[streaming] def cusumDaily(batch: DataFrame): DataFrame =
    graft.ops.Stats.cusumDaily(instantTs(batch))

  /** Merge a batch's daily-cents partials into the (type, day, cents)
    * state — exact integer cents are algebraic, so merge = keyed SUM and
    * the fold is bit-identical at any batch cut (an IEEE-double revenue
    * sum would drift with the cut points); state is calendar×types
    * bounded, never stream volume. Same exactly-once caveat as
    * [[topkMergeCounts]]. */
  def cusumMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.event_type") <=> col("d.event_type")
        && col("s.day") <=> col("d.day"), "full_outer")
      .select(coalesce(col("d.event_type"), col("s.event_type")).as("event_type"),
        coalesce(col("d.day"), col("s.day")).as("day"),
        (coalesce(col("s.cents"), lit(0L)) + coalesce(col("d.cents"), lit(0L)))
          .as("cents"))
  }

  /** foreachBatch fold for the changepoint state (twin of the batch
    * changepoint_cusum op): level-shift monitors run continuously, and
    * each arriving day re-scores the CUSUM argmax over the grid the fold
    * has accumulated so far. */
  def cusumSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(cusumMerge(readState(), cusumDaily(batch)))
    }

  /** Read side of [[cusumSink]]: the CUSUM argmax over the bounded grid —
    * LITERALLY the batch op's view ([[graft.ops.Stats.cusumView]]). */
  def cusumView(state: DataFrame): DataFrame =
    graft.ops.Stats.cusumView(state)

  /** Streaming twin of the batch join_broadcast op: STREAM-STATIC
    * enrichment — the most common production streaming pattern (decorate
    * facts with dimension attributes as they arrive). LITERALLY the batch
    * op's join ([[graft.ops.Relational.enrichView]]): Spark plans the
    * static side as the same BroadcastHashJoin for a streaming fact side,
    * and an INNER stream-static join is stateless by construction — no
    * watermark, no state store, each micro-batch enriches independently,
    * which is why the twin needs no fold at all. */
  def enrich(customers: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    graft.ops.Relational.enrichView(customers, nation, region)

  /** Per-batch (type, user) train/holdout count partials for the
    * leakage twin — LITERALLY the batch op's grid pass
    * ([[graft.ops.Audit.splitTemporalGrid]]). */
  private[streaming] def leakGrid(batch: DataFrame): DataFrame =
    graft.ops.Audit.splitTemporalGrid(instantTs(batch))

  /** Merge a batch's grid partials into the (type, user, n_tr, n_ho)
    * state — counts are algebraic, merge = keyed SUM. The LEAK flags are
    * NOT state: a user whose first holdout event arrives later flips
    * from clean to leaked, so flags must be evaluated over the completed
    * grid ([[leakView]]), never folded. State is |types×users| bounded —
    * the entity domain, not stream volume. Same exactly-once caveat as
    * [[topkMergeCounts]]. */
  def leakMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.event_type") <=> col("d.event_type")
        && col("s.user_id") <=> col("d.user_id"), "full_outer")
      .select(coalesce(col("d.event_type"), col("s.event_type")).as("event_type"),
        coalesce(col("d.user_id"), col("s.user_id")).as("user_id"),
        (coalesce(col("s.n_tr"), lit(0L)) + coalesce(col("d.n_tr"), lit(0L))).as("n_tr"),
        (coalesce(col("s.n_ho"), lit(0L)) + coalesce(col("d.n_ho"), lit(0L))).as("n_ho"))
  }

  /** foreachBatch fold for the temporal-split leakage state (twin of the
    * batch split_temporal op): eval-set honesty is monitored as events
    * arrive — a training user straying into the holdout window is
    * flagged on the batch after it happens. */
  def leakSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(leakMerge(readState(), leakGrid(batch)))
    }

  /** Read side of [[leakSink]]: the leakage audit over the completed
    * grid — LITERALLY the batch op's view
    * ([[graft.ops.Audit.splitTemporalView]]). */
  def leakView(state: DataFrame): DataFrame =
    graft.ops.Audit.splitTemporalView(state)

  /** Per-batch (lang, pred_lang) confusion partials for the classifier-
    * monitor twin — LITERALLY the batch op's grid pass
    * ([[graft.ops.Text.langConfusionGrid]]), so the monitored classifier
    * is provably the shipped one. (No timestamps involved — documents
    * stream without event time.) */
  private[streaming] def langGrid(batch: DataFrame): DataFrame =
    graft.ops.Text.langConfusionGrid(batch)

  /** Merge a batch's confusion partials into the (lang, pred_lang, n)
    * state — counts are algebraic, merge = keyed SUM; state is bounded
    * by |langs|², never stream volume. Null-safe key equality: NULL
    * actual-lang docs form their own audited cell. Same exactly-once
    * caveat as [[topkMergeCounts]]. */
  def langMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.lang") <=> col("d.lang")
        && col("s.pred_lang") <=> col("d.pred_lang"), "full_outer")
      .select(coalesce(col("d.lang"), col("s.lang")).as("lang"),
        coalesce(col("d.pred_lang"), col("s.pred_lang")).as("pred_lang"),
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"))
  }

  /** foreachBatch fold for the classifier-monitor state (twin of the
    * batch lang_id_eval op): the heuristic gate's error surface is
    * recomputed continuously as documents arrive — the standard check
    * that an upstream corpus shift hasn't degraded a routing
    * classifier. */
  def langSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(langMerge(readState(), langGrid(batch)))
    }

  /** Read side of [[langSink]]: flags + ordering over the bounded grid —
    * LITERALLY the batch op's view
    * ([[graft.ops.Text.langConfusionView]]). */
  def langView(state: DataFrame): DataFrame =
    graft.ops.Text.langConfusionView(state)

  /** Merge (source, pred_lang) routing-cell partials (twin state of the
    * batch lang_routing op) — every cell is algebraic (doc count, token
    * sum, mixed-flag count) under doc-at-most-once delivery, ONE keyed
    * SUM merge. State bound: ≤|sources|·|langs| rows regardless of
    * stream length. NULL source is a grouping value (its own lane),
    * never a join key. */
  def routeMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("source", "pred_lang")
      .agg(sum(col("n")).as("n"), sum(col("n_tok")).as("n_tok"),
        sum(col("n_mixed")).as("n_mixed"))

  /** foreachBatch fold for the per-language routing monitor (twin of the
    * batch lang_routing op): the "what does each source feed each
    * language branch, and how much of it is mixed text" matrix stays
    * current as documents arrive. */
  def routeSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(routeMerge(readState(), graft.ops.Text.routeGrid(batch)))
    }

  /** Read side of [[routeSink]] — LITERALLY the batch op's view. */
  def routeView(state: DataFrame): DataFrame =
    graft.ops.Text.routeView(state)

  /** Per-batch count-min cell partials for the heavy-hitters twin —
    * LITERALLY the batch op's cell pass ([[graft.ops.Text.hhCells]]). */
  private[streaming] def hhCells(batch: DataFrame): DataFrame =
    graft.ops.Text.hhCells(batch)

  /** Per-batch exact candidate-count partials — LITERALLY the batch op's
    * audit pass ([[graft.ops.Text.hhCand]]). */
  private[streaming] def hhCand(batch: DataFrame): DataFrame =
    graft.ops.Text.hhCand(batch)

  /** Merge a batch's CMS cell partials into the (d, bucket, cn) state —
    * count-min cells are the textbook MERGEABLE sketch: merge = cell-wise
    * SUM, and the state never exceeds the 4×1024 grid no matter the
    * stream volume. Same exactly-once caveat as [[topkMergeCounts]]. */
  def hhCellsMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.d") <=> col("d.d") && col("s.bucket") <=> col("d.bucket"),
        "full_outer")
      .select(coalesce(col("d.d"), col("s.d")).as("d"),
        coalesce(col("d.bucket"), col("s.bucket")).as("bucket"),
        (coalesce(col("s.cn"), lit(0L)) + coalesce(col("d.cn"), lit(0L))).as("cn"))
  }

  /** Merge a batch's exact candidate counts into the (tok, exact_n)
    * state — the audit side is vocab-bounded (not stream-bounded), the
    * documented trade of carrying the overcount audit next to the
    * sketch; a deployment that cannot hold the vocabulary keeps only
    * [[hhCellsMerge]]'s 4096 cells and samples candidates instead. */
  def hhCandMerge(state: DataFrame, delta: DataFrame): DataFrame = {
    val s = state.as("s"); val d = delta.as("d")
    s.join(d, col("s.tok") <=> col("d.tok"), "full_outer")
      .select(coalesce(col("d.tok"), col("s.tok")).as("tok"),
        (coalesce(col("s.exact_n"), lit(0L))
          + coalesce(col("d.exact_n"), lit(0L))).as("exact_n"))
  }

  /** foreachBatch fold for the heavy-hitters state (twin of the batch
    * heavy_hitters op): token frequency monitors run against the ingest
    * stream, and both folds are keyed SUM merges of algebraic counts, so
    * the final state — and therefore [[hhView]] — is identical at any
    * batch cut. */
  def hhSink(docs: DataFrame)(readCells: () => DataFrame, readCand: () => DataFrame)(
      writeCells: DataFrame => Unit, writeCand: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeCells(hhCellsMerge(readCells(), hhCells(batch)))
      writeCand(hhCandMerge(readCand(), hhCand(batch)))
    }

  /** Read side of [[hhSink]]: estimate + rank over the bounded state —
    * LITERALLY the batch op's view ([[graft.ops.Text.hhView]]). */
  def hhView(cells: DataFrame, cand: DataFrame): DataFrame =
    graft.ops.Text.hhView(cells, cand)

  /** Merge per-batch (w, n, df) vocabulary partials (twin state of the
    * batch vocab_topk op) — keyed SUM merge: term frequency is algebraic,
    * and df is too BECAUSE each document arrives exactly once (its 0/1
    * per-word df contribution is batch-local), so the fold needs no
    * count(DISTINCT) over history. Same exactly-once caveat as
    * [[topkMergeCounts]] — here a replay would also double-count df. */
  def vtopkMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("w")
      .agg(sum(col("n")).as("n"), sum(col("df")).as("df"))

  /** foreachBatch fold for the corpus vocabulary table (twin of the
    * batch vocab_topk op): the tokenizer-vocab / idf table recomputed as
    * documents stream in — the nightly-drop fold a vocab pipeline
    * actually runs (re-rank from the folded grid, never rescan). */
  def vtopkSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(vtopkMerge(readState(), graft.ops.Text.vocabTfGrid(batch)))
    }

  /** Read side of [[vtopkSink]] — LITERALLY the batch op's view. */
  def vtopkView(state: DataFrame): DataFrame =
    graft.ops.Text.vocabTopView(state)

  /** Merge a batch's content digests into the stored dedup index (twin
    * state of the batch dedup_incremental op) — union + distinct,
    * IDEMPOTENT: replays are absorbed outright (the contamination
    * presence-grid argument). */
  def indexMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).distinct()

  /** foreachBatch fold for the persisted content-hash index — the
    * production dedup shape: history streams in ONCE (digests folded,
    * text never retained), and every nightly drop then checks in against
    * the completed index via [[dedupIncrView]]. */
  def indexSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(indexMerge(readState(), graft.ops.Dedup.dedupIndex(batch)))
    }

  /** Read side of [[indexSink]]: dedup a new drop against the folded
    * index — LITERALLY the batch op's view. */
  def dedupIncrView(batchDocs: DataFrame, idx: DataFrame): DataFrame =
    graft.ops.Dedup.dedupIncrView(batchDocs, idx)

  /** Merge per-batch (source, h, df) doc-frequency partials and
    * (source, n_docs) counts (twin state of the batch boilerplate_detect
    * op) — keyed SUM merges: both are algebraic BECAUSE each document
    * arrives exactly once (its distinct-shingle presence and its doc
    * count are batch-local — the vtopkMerge df argument). */
  def boilerDfMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("source", "h")
      .agg(sum(col("df")).as("df"))

  def boilerDocsMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"))

  /** foreachBatch fold for the within-source boilerplate statistics
    * (twin of the batch boilerplate_detect op): the crawl streams in,
    * the per-source furniture statistics fold, and
    * [[boilerView]] re-screens any drop against the completed corpus —
    * the threshold set sharpens as more of a site is seen, which only
    * the view-over-completed-fold shape tracks. */
  def boilerSink(docs: DataFrame)(readDf: () => DataFrame,
      readDocs: () => DataFrame)(writeDf: DataFrame => Unit,
      writeDocs: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeDf(boilerDfMerge(readDf(), graft.ops.Audit.boilerDfGrid(batch)))
      writeDocs(boilerDocsMerge(readDocs(), graft.ops.Audit.boilerDocsGrid(batch)))
    }

  /** Read side of [[boilerSink]]: screen docs against the folded
    * statistics — LITERALLY the batch op's view. */
  def boilerView(docs: DataFrame, dfGrid: DataFrame,
      docsGrid: DataFrame): DataFrame =
    graft.ops.Audit.boilerView(docs, dfGrid, docsGrid)

  /** Merge per-batch per-source PII incidence partials (twin state of
    * the batch pii_report op) — every cell is an algebraic count under
    * doc-at-most-once delivery, ONE keyed SUM merge. */
  def piiMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("d_email")).as("d_email"), sum(col("m_email")).as("m_email"),
        sum(col("d_ip")).as("d_ip"), sum(col("m_ip")).as("m_ip"),
        sum(col("d_num")).as("d_num"), sum(col("m_num")).as("m_num"))

  /** foreachBatch fold for the PII incidence monitor (twin of the batch
    * pii_report op): the "which sources carry PII" table recomputed as
    * the crawl streams in — the alarm a curator wants BEFORE a
    * PII-heavy source reaches the training mix. */
  def piiSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(piiMerge(readState(), graft.ops.Pipeline.piiGrid(batch)))
    }

  /** Read side of [[piiSink]] — LITERALLY the batch op's view. */
  def piiView(state: DataFrame): DataFrame =
    graft.ops.Pipeline.piiView(state)

  /** Streaming twin of the batch interval_merge op: DYNAMIC-GAP session
    * windows — each event extends its session by its OWN duration
    * (props.k minutes), so overlapping per-user intervals coalesce
    * exactly like the batch islands. This is the session_window feature
    * the fixed-gap twin ([[session]]) can't show: the gap is a per-row
    * expression, not a constant. Boundary semantics: Spark merges
    * sessions only on strict overlap (next start < current end), while
    * the batch op also merges exact touches (start == end) — the parity
    * drive asserts the fixture has no touch cases, making the outputs
    * identical (and documenting the one boundary where they could
    * differ). Watermark-expired session state is dropped as usual —
    * bounded state on an unbounded stream. */
  def intervalMerge(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    instantTs(events).withWatermark("ts", watermark)
      // session_window silently filters non-positive gaps; the explicit
      // predicate makes the zero-duration-drops-out contract visible and
      // IS the batch op's (graft.ops.intervalK — one shared definition)
      .filter(graft.ops.intervalK >= 1)
      .withColumn("gap", concat(graft.ops.intervalK, lit(" minutes")))
      .groupBy(session_window(col("ts"), col("gap")), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"))

  // ------------------------------------------------------------------
  // Grid-fold twins of the remaining batch event analytics. These merges
  // use union + re-aggregate rather than the full_outer-join style above:
  // for decimal sums it is the only form that preserves the batch ops'
  // NULL semantics exactly (SUM skips NULL partials but yields NULL when
  // every contribution is NULL — a coalesce-to-0 join merge would turn
  // an all-NULL cell into 0), and for presence grids the merge is just
  // idempotent set union. Same exactly-once caveat as topkMergeCounts.
  // ------------------------------------------------------------------

  /** Merge (dow, hod, n) hour-of-week count partials — twin state of the
    * batch activity_profile op; ≤169 cells, never stream volume. */
  def activityMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("dow", "hod")
      .agg(sum(col("n")).as("n"))

  /** foreachBatch fold for the hour-of-week load matrix (twin of the
    * batch activity_profile op): the capacity-planning profile is
    * maintained continuously as traffic arrives. */
  def activitySink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(activityMerge(readState(),
        graft.ops.Events.activityGrid(instantTs(batch))))
    }

  /** Read side of [[activitySink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.activityView]]). */
  def activityView(state: DataFrame): DataFrame =
    graft.ops.Events.activityView(state)

  /** Merge (event_type, n, dsum) partials — twin state of the batch
    * agg_incremental op, whose CONTRACT is precisely this merge
    * (yesterday's rollup + today's delta == the full recompute); the
    * fold is that contract applied per micro-batch. Delegates to the
    * batch op's own merge ([[graft.ops.Events.incrMergeGrids]]) so twin
    * and op cannot drift. */
  def incrMerge(state: DataFrame, delta: DataFrame): DataFrame =
    graft.ops.Events.incrMergeGrids(state, delta)

  /** foreachBatch fold for the incremental rollup (twin of the batch
    * agg_incremental op). */
  def incrSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(incrMerge(readState(),
        graft.ops.Events.incrPartial(instantTs(batch))))
    }

  /** Read side of [[incrSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.incrView]]). */
  def incrView(state: DataFrame): DataFrame =
    graft.ops.Events.incrView(state)

  /** Merge (user_id, week) presence partials — twin state of the batch
    * retention_cohort op. Presence is idempotent (set union), so the
    * fold also absorbs redelivered rows — stronger than the counting
    * folds' exactly-once caveat. COHORT ASSIGNMENT IS NOT STATE: a
    * user's first-active week flips when an earlier event arrives in a
    * later batch, so it lives in [[retentionView]] over the completed
    * grid (the split_temporal flags-are-view discipline). */
  def retentionMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).distinct()

  /** foreachBatch fold for the retention presence grid (twin of the
    * batch retention_cohort op). */
  def retentionSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(retentionMerge(readState(),
        graft.ops.Events.retentionGrid(instantTs(batch))))
    }

  /** Read side of [[retentionSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.retentionView]]). */
  def retentionView(state: DataFrame): DataFrame =
    graft.ops.Events.retentionView(state)

  /** Merge (user_id, day) presence partials — twin state of the batch
    * rolling_active_users op; idempotent set union like
    * [[retentionMerge]]. */
  def rauMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).distinct()

  /** foreachBatch fold for the DAU/WAU presence grid (twin of the batch
    * rolling_active_users op): engagement dashboards maintain exactly
    * this user-day grid as events arrive; the ×7 cover explosion and
    * count run in the view, over already-deduped rows only. */
  def rauSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(rauMerge(readState(),
        graft.ops.Events.rauGrid(instantTs(batch))))
    }

  /** Read side of [[rauSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.rauView]]). */
  def rauView(state: DataFrame): DataFrame =
    graft.ops.Events.rauView(state)

  /** Merge (user_id, wk, rev) decimal revenue partials — twin state of
    * the batch cohort_ltv op: exact decimal sums are algebraic, and the
    * union form preserves the all-NULL-cell-stays-NULL semantics (see
    * block comment above). Cohort assignment is view-side, like
    * [[retentionMerge]]. */
  def ltvMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("user_id", "wk")
      .agg(sum(col("rev"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 2)).as("rev"))

  /** foreachBatch fold for the LTV revenue grid (twin of the batch
    * cohort_ltv op). */
  def ltvSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(ltvMerge(readState(),
        graft.ops.Events.ltvGrid(instantTs(batch))))
    }

  /** Read side of [[ltvSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.ltvView]]). */
  def ltvView(state: DataFrame): DataFrame =
    graft.ops.Events.ltvView(state)

  // ------------------------------------------------------------------
  // Ordered-fold twins: the remaining per-event / chained-stage batch
  // analytics. Their folds carry bounded per-key state (a 3-timestamp
  // funnel, one last reading, a ≤7-row lag ring, a presence bit, an
  // arrival high-water mark) and are EXACT under per-user event-time-
  // ordered arrival — the Kafka-per-key / watermark-sorted-replay
  // deployment shape; an out-of-order source would buffer each batch to
  // its watermark boundary first (the session/ohlc twins' append-mode
  // discipline). Every fold step is the batch op's own code
  // (Events.*Fold — the batch op is the same fold applied once), so twin
  // and op cannot drift.
  // ------------------------------------------------------------------

  /** foreachBatch fold for the signup→click→purchase funnel (twin of the
    * batch event_funnel op): per-user stage timestamps advance as events
    * arrive — the live growth-funnel counter. */
  def funnelSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(graft.ops.Events.funnelFold(readState(), instantTs(batch)))
    }

  /** Read side of [[funnelSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.funnelView]]). */
  def funnelView(state: DataFrame): DataFrame =
    graft.ops.Events.funnelView(state)

  /** foreachBatch fold for the time-weighted average (twin of the batch
    * time_weighted_avg op): the gauge integral accumulates as readings
    * arrive; state is ONE last reading + three algebraic partials per
    * user. */
  def twaSink(events: DataFrame)(readLast: () => DataFrame,
      readAcc: () => DataFrame)(writeLast: DataFrame => Unit,
      writeAcc: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (last, acc) =
        graft.ops.Events.twaFold(readLast(), readAcc(), instantTs(batch))
      writeAcc(acc)
      writeLast(last)
    }

  /** Read side of [[twaSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.twaView]]). */
  def twaView(acc: DataFrame): DataFrame =
    graft.ops.Events.twaView(acc)

  /** foreachBatch fold for the dyadic EMA (twin of the batch win_ema
    * op): per-event output, so the sink appends emitted rows to an
    * output log next to the ≤7-row per-user lag ring it carries. */
  def emaSink(events: DataFrame)(readRing: () => DataFrame,
      readOut: () => DataFrame)(writeRing: DataFrame => Unit,
      writeOut: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (out, ring) = graft.ops.Events.emaFold(readRing(), instantTs(batch))
      writeOut(readOut().unionByName(out))
      writeRing(ring)
    }

  /** foreachBatch fold for the running-distinct counter (twin of the
    * batch win_running_distinct op): per-event output over a one-bit
    * (user, type) presence grid. */
  def rdSink(events: DataFrame)(readSeen: () => DataFrame,
      readOut: () => DataFrame)(writeSeen: DataFrame => Unit,
      writeOut: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (out, seen) = graft.ops.Events.rdFold(readSeen(), instantTs(batch))
      writeOut(readOut().unionByName(out))
      writeSeen(seen)
    }

  /** Merge (bucket, user, n) lateness partials — keyed SUM over null-safe
    * keys (twin state of the batch watermark_audit op). */
  def wmGridMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("bucket", "user_id")
      .agg(sum(col("n")).as("n"))

  /** foreachBatch fold for the watermark-sizing audit (twin of the batch
    * watermark_audit op). A stream receives events in ARRIVAL order by
    * definition, so this fold needs no ordering precondition at all: the
    * carried per-user high-water mark + the intra-batch running max
    * reproduce the batch op's arrival window exactly at any batch cut.
    * State = one µs mark per user + the ≤5×|users| band grid. */
  def wmSink(events: DataFrame)(readHwm: () => DataFrame,
      readGrid: () => DataFrame)(writeHwm: DataFrame => Unit,
      writeGrid: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      import graft.ops.Events
      val e = Events.wmProjected(instantTs(batch))
      val intra = Window.partitionBy("user_id").orderBy("aus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val st = readHwm().select(col("user_id").as("h_uid"), col("hwm").as("s_hwm"))
      val bucketed = e.withColumn("ihwm", max("tus").over(intra))
        // null-safe: a NULL user is its own arrival-ordered partition
        .join(st, col("user_id") <=> col("h_uid"), "left")
        .withColumn("bucket", Events.wmBucket(
          Events.wmLateness(greatest(col("ihwm"), col("s_hwm")), col("tus"))))
      writeGrid(wmGridMerge(readGrid(), Events.wmGrid(bucketed)))
      writeHwm(readHwm()
        .unionByName(e.groupBy("user_id").agg(max("tus").as("hwm")))
        .groupBy("user_id").agg(max("hwm").as("hwm")))
    }

  /** Read side of [[wmSink]] — LITERALLY the batch op's view
    * ([[graft.ops.Events.wmView]]). */
  def wmView(grid: DataFrame): DataFrame =
    graft.ops.Events.wmView(grid)

  // ------------------------------------------------------------------
  // Grid-fold twins beyond the event family: the corpus-table monitors
  // (documents / embeddings streams). Same algebraic-fold discipline —
  // the batch ops' own grid passes and views, shared verbatim.
  // ------------------------------------------------------------------

  /** Merge per-language fertility sum partials (twin state of the batch
    * tokenizer_fertility op) — five algebraic sums, keyed SUM merge. */
  def fertilityMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("lang")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_bpe")).as("n_bpe"),
        sum(col("n_ws")).as("n_ws"), sum(col("n_chars")).as("n_chars"),
        sum(col("n_bytes")).as("n_bytes"))

  /** foreachBatch fold for the tokenizer-efficiency table (twin of the
    * batch tokenizer_fertility op): the fertility table every
    * multilingual budget reads stays current as documents arrive. */
  def fertilitySink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(fertilityMerge(readState(),
        graft.ops.Text.fertilityGrid(batch)))
    }

  /** Read side of [[fertilitySink]] — LITERALLY the batch op's view. */
  def fertilityView(state: DataFrame): DataFrame =
    graft.ops.Text.fertilityView(state)

  /** Merge per-source (docs, tokens) partials (twin state of the batch
    * sample_temperature op). */
  def temperatureMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))

  /** foreachBatch fold for the temperature-mixing table (twin of the
    * batch sample_temperature op): the mixing weights a corpus-assembly
    * job executes are recomputed continuously as the corpus grows —
    * which is exactly how production re-balances a live crawl. */
  def temperatureSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(temperatureMerge(readState(),
        graft.ops.Pipeline.temperatureGrid(batch)))
    }

  /** Read side of [[temperatureSink]] — LITERALLY the batch op's view
    * (sqrt-then-quantize runs in the view over the completed sums, so
    * the fold state stays pure integers). */
  def temperatureView(state: DataFrame): DataFrame =
    graft.ops.Pipeline.temperatureView(state)

  /** Merge per-(lang, half, dim) exact-decimal component-sum partials —
    * twin state of the batch embed_drift op; union + re-aggregate keeps
    * SUM's NULL algebra (see the grid-fold block comment above). */
  def driftVecMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("lang", "half", "pos")
      .agg(sum(col("sv"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 7)).as("sv"))

  /** Merge per-(lang, half) vector-count partials. */
  def driftCountMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("lang", "half")
      .agg(sum(col("n")).as("n"))

  /** foreachBatch fold for the embedding-space drift monitor (twin of
    * the batch embed_drift op): embeddings STREAM in (the live encoder
    * output) and join the static documents dim for language — the
    * stream-static enrichment shape — then fold into the bounded
    * |langs|×2×64 decimal sum grid; the centroid cosine is recomputed
    * from the completed fold at any cut. */
  def driftVecSink(emb: DataFrame, docs: DataFrame)(
      readSums: () => DataFrame, readCounts: () => DataFrame)(
      writeSums: DataFrame => Unit, writeCounts: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    emb.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val hv = graft.ops.Llm.driftHalves(batch, docs)
      writeSums(driftVecMerge(readSums(), graft.ops.Llm.driftSumGrid(hv)))
      writeCounts(driftCountMerge(readCounts(), graft.ops.Llm.driftCountGrid(hv)))
    }

  /** Read side of [[driftVecSink]] — LITERALLY the batch op's view. */
  def driftVecView(sums: DataFrame, counts: DataFrame): DataFrame =
    graft.ops.Llm.driftView(sums, counts)

  /** Merge (event_type, digit, digit2) observation-count partials (twin
    * state of the batch benford_audit AND benford_second ops — one stored
    * grid serves both screens) — keyed SUM merge. digit2 is NULL for
    * one-digit amounts; NULL is a grouping value here (one cell), never a
    * join key, so the fold stays exact. State bound: ≤90·|event types|
    * rows regardless of stream length. */
  def benfordMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("event_type", "digit", "digit2")
      .agg(sum(col("n_obs")).as("n_obs"))

  /** foreachBatch fold for the Benford screens (twin of the batch
    * benford_audit / benford_second ops): the fabricated-data /
    * unit-mix-up audits stay current as ledger events arrive. */
  def benfordSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(benfordMerge(readState(),
        graft.ops.Audit.benfordGrid(batch)))
    }

  /** Read side of [[benfordSink]] — LITERALLY the batch op's view. */
  def benfordView(state: DataFrame): DataFrame =
    graft.ops.Audit.benfordView(state)

  /** Second read over the SAME [[benfordSink]] state — the batch
    * benford_second op recomputed at any batch cut (the seqView pattern:
    * a new monitor costs zero new state). */
  def benfordSecondView(state: DataFrame): DataFrame =
    graft.ops.Audit.benfordSecondView(state)

  /** Third read over the SAME [[benfordSink]] state — the size-invariant
    * MAD conformity bands (batch op benford_mad); the statistic forensic
    * practice trusts at stream scale, where χ² rejects everything. */
  def benfordMadView(state: DataFrame): DataFrame =
    graft.ops.Audit.benfordMadView(state)

  /** Merge distinct (source, shingle-hash) presence partials (twin state
    * of the batch contamination_matrix op) — union + distinct, IDEMPOTENT:
    * replays and redelivered batches are absorbed outright (a presence
    * set, the rolling_active_users argument). */
  def contaminationMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).distinct()

  /** foreachBatch fold for the cross-source leakage matrix (twin of the
    * batch contamination_matrix op): which sources leak into which,
    * recomputed as the crawl streams in — the table a curator watches to
    * catch a mirror site entering the corpus under a second source name. */
  def contaminationSink(docs: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(contaminationMerge(readState(),
        graft.ops.Audit.contaminationGrid(batch)))
    }

  /** Read side of [[contaminationSink]] — LITERALLY the batch op's view. */
  def contaminationView(state: DataFrame): DataFrame =
    graft.ops.Audit.contaminationView(state)

  /** Merge per-user (last_day, count, cents-sum) partials (twin state of
    * the batch event_rfm op) — keyed (max, sum, sum) merge: all three
    * RFM cells are algebraic. */
  def rfmMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("user_id")
      .agg(max(col("last_day")).as("last_day"),
        sum(col("f")).as("f"), sum(col("m_cents")).as("m_cents"))

  /** foreachBatch fold for the RFM segmentation (twin of the batch
    * event_rfm op): anchor, quintiles and scores recompute from the
    * completed fold at any cut — live RFM, which is exactly how campaign
    * audiences are refreshed. */
  def rfmSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(rfmMerge(readState(), graft.ops.Events.rfmGrid(batch)))
    }

  /** Read side of [[rfmSink]] — LITERALLY the batch op's view. */
  def rfmView(state: DataFrame): DataFrame =
    graft.ops.Events.rfmView(state)

  /** Merge distinct (user, type) basket presence partials (twin state of
    * the batch assoc_rules op) — union + distinct, IDEMPOTENT: replays
    * are absorbed outright (the rolling_active_users argument). */
  def assocMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).distinct()

  /** foreachBatch fold for the association-rule table (twin of the batch
    * assoc_rules op): the "users who did A also did B" table recomputed
    * as events arrive. */
  def assocSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(assocMerge(readState(), graft.ops.Events.assocGrid(batch)))
    }

  /** Read side of [[assocSink]] — LITERALLY the batch op's view. */
  def assocView(state: DataFrame): DataFrame =
    graft.ops.Events.assocView(state)

  /** Merge per-(day, cents) tie-group count partials (twin state of the
    * rank family: eval_auc / ab_ranksum / ab_ks_test) — keyed SUM merge:
    * the tie-group grid is algebraic, and ranks, U, the tie-corrected
    * variance and the KS supremum are all functions of tie-group counts
    * alone. */
  def rankMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("day", "cents")
      .agg(sum(col("c_a")).as("c_a"), sum(col("c_b")).as("c_b"))

  /** foreachBatch fold for the rank-statistics family (twin of the batch
    * eval_auc / ab_ranksum / ab_ks_test ops): ONE fold keeps all three
    * nonparametric experiment monitors current as events arrive — live
    * AUC / rank-sum / KS over the running cohorts, which is exactly how
    * an experiment dashboard is refreshed. */
  def rankSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(rankMerge(readState(), graft.ops.Stats.rankGrid(batch)))
    }

  /** Read sides of [[rankSink]] — LITERALLY the batch ops' views over
    * the shared per-day rank sufficient statistics. */
  def rankAucView(state: DataFrame): DataFrame =
    graft.ops.Stats.aucView(graft.ops.Stats.rankStats(state))
  def rankRanksumView(state: DataFrame): DataFrame =
    graft.ops.Stats.ranksumView(graft.ops.Stats.rankStats(state))
  def rankKsView(state: DataFrame): DataFrame =
    graft.ops.Stats.ksView(graft.ops.Stats.rankStats(state))

  /** Merge per-user (first_day, conv_day, last_day) partials (twin state
    * of the batch survival_hazard op) — keyed (min, min, max) merge.
    * min/max skip NULLs, so a batch in which the user never converts
    * merges as the identity on conv_day — the right-censoring cell stays
    * NULL until a qualifying conversion actually arrives. */
  def survivalMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("user_id")
      .agg(min(col("first_day")).as("first_day"),
        min(col("conv_day")).as("conv_day"),
        max(col("last_day")).as("last_day"))

  /** foreachBatch fold for the Kaplan-Meier hazard table (twin of the
    * batch survival_hazard op): the censoring anchor advances and every
    * unconverted user is re-censored as events arrive — live
    * time-to-conversion, recomputed from the completed fold at any cut. */
  def survivalSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(survivalMerge(readState(),
        graft.ops.Stats.survivalGrid(batch)))
    }

  /** Read side of [[survivalSink]] — LITERALLY the batch op's view. */
  def survivalView(state: DataFrame): DataFrame =
    graft.ops.Stats.survivalView(state)

  /** foreachBatch fold for the inter-event gap distribution (twin of the
    * batch event_interarrival op): an ORDERED fold (the win_ema class —
    * exact under per-(user, type) event-time-ordered arrival) carrying
    * one last event per key plus the (type, bucket) gap grid; the gap
    * spanning a batch cut is produced by the batch op's own grid stage
    * over the carried pseudo-rows ([[graft.ops.Events.interarrivalFold]]). */
  def interarrivalSink(events: DataFrame)(readLast: () => DataFrame,
      readGrid: () => DataFrame)(writeLast: DataFrame => Unit,
      writeGrid: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (last, grid) = graft.ops.Events.interarrivalFold(
        readLast(), readGrid(), instantTs(batch))
      writeGrid(grid)
      writeLast(last)
    }

  /** Read side of [[interarrivalSink]] — LITERALLY the batch op's view. */
  def interarrivalView(grid: DataFrame): DataFrame =
    graft.ops.Events.interarrivalView(grid)

  /** Merge per-day arm-count partials (twin state of the batch ab_srm
    * op) — keyed SUM merge. */
  def srmMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("day")
      .agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"))

  /** foreachBatch fold for the sample-ratio-mismatch screen (twin of the
    * batch ab_srm op): the GLOBAL mix recomputes from the completed fold
    * at every cut, so every day's χ² is re-judged as events arrive —
    * exactly how an experimentation platform's SRM alarm behaves. */
  def srmSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(srmMerge(readState(), graft.ops.Stats.srmGrid(batch)))
    }

  /** Read side of [[srmSink]] — LITERALLY the batch op's view. */
  def srmView(state: DataFrame): DataFrame =
    graft.ops.Stats.srmView(state)

  /** Second read side of [[srmSink]] — the rolling correlation monitor
    * reads the SAME day-count fold (one fold, two monitors: the
    * rank-family pattern). */
  def srmCorrView(state: DataFrame): DataFrame =
    graft.ops.Stats.corrView(state)

  /** foreachBatch fold for the Bollinger band (twin of the batch
    * win_bollinger op): per-event output over the carried ≤7-row
    * per-user ring — the emaFold class, band arithmetic. */
  def bollSink(events: DataFrame)(readRing: () => DataFrame,
      readOut: () => DataFrame)(writeRing: DataFrame => Unit,
      writeOut: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (out, ring) = graft.ops.Events.bollFold(readRing(), instantTs(batch))
      writeOut(readOut().unionByName(out))
      writeRing(ring)
    }

  /** Merge per-user pre/post cents partials (twin state of the batch
    * ab_cuped op) — keyed SUM merge (the conditional sums are algebraic;
    * the 0-for-missing contract holds at any cut because 0 is SUM's
    * identity). */
  def cupedMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("user_id")
      .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))

  /** foreachBatch fold for the CUPED-adjusted comparison (twin of the
    * batch ab_cuped op): θ and the adjusted means recompute from the
    * completed user grid at every cut — live variance reduction over the
    * running experiment. */
  def cupedSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(cupedMerge(readState(), graft.ops.Stats.cupedUserGrid(batch)))
    }

  /** Read side of [[cupedSink]] — LITERALLY the batch op's view. */
  def cupedView(state: DataFrame): DataFrame =
    graft.ops.Stats.cupedView(state)

  /** Merge (cents, c_neg, c_pos) tie-group partials (twin state of
    * calibration_table AND gains_table) — keyed SUM merge: decile
    * edges, rates, gains and lifts are all functions of tie-group
    * counts alone (the rank-family argument). */
  def scoreMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("cents")
      .agg(sum(col("c_neg")).as("c_neg"), sum(col("c_pos")).as("c_pos"))

  /** foreachBatch fold for the score-quality tables (twin of the batch
    * calibration_table / gains_table ops): ONE fold keeps both decile
    * tables current — the global decile EDGES move with every batch, so
    * only the view-over-completed-fold shape can track them. */
  def scoreSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(scoreMerge(readState(), graft.ops.Stats.scoreGrid(batch)))
    }

  /** Read sides of [[scoreSink]] — LITERALLY the batch ops' views. */
  def scoreCalibView(state: DataFrame): DataFrame =
    graft.ops.Stats.calibView(state)
  def scoreGainsView(state: DataFrame): DataFrame =
    graft.ops.Stats.gainsView(state)

  /** Merge (type, replicate) weighted-sum partials (twin state of the
    * batch bootstrap_ci op) — keyed SUM merge: each event's replicate
    * weights are a pure function of its id, so partials from any batch
    * split fold to the identical grid. */
  def bootMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("event_type", "b")
      .agg(sum(col("sw")).as("sw"), sum(col("swx")).as("swx"))

  /** foreachBatch fold for the bootstrap confidence band (twin of the
    * batch bootstrap_ci op): all 32 resample means tighten together as
    * events arrive — a live uncertainty band over the running metric. */
  def bootSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(bootMerge(readState(), graft.ops.Stats.bootGrid(batch)))
    }

  /** Read side of [[bootSink]] — LITERALLY the batch op's view. */
  def bootView(state: DataFrame): DataFrame =
    graft.ops.Stats.bootView(state)

  /** Merge per-type sufficient-moment partials (twin state of the batch
    * ab_power op) — keyed SUM merge over exact decimal moments. */
  def powerMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("event_type")
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sxx")).cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("sxx"))

  /** foreachBatch fold for the experiment-sizing table (twin of the
    * batch ab_power op): required sample sizes tighten as the variance
    * estimate converges — the live read a platform shows while an
    * experiment is being designed against current traffic. */
  def powerSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(powerMerge(readState(), graft.ops.Stats.powerGrid(batch)))
    }

  /** Read side of [[powerSink]] — LITERALLY the batch op's view. */
  def powerView(state: DataFrame): DataFrame =
    graft.ops.Stats.powerView(state)

  /** Merge (user, week) presence partials (twin state of the batch
    * churn_rate op) — union + distinct, IDEMPOTENT: replays absorb
    * outright (the rolling_active_users argument). */
  def churnMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).distinct()

  /** foreachBatch fold for the weekly churn KPI (twin of the batch
    * churn_rate op): the right-censoring anchor (last in-data week)
    * advances with every batch, re-admitting the week before it — only
    * the view-over-completed-fold shape tracks that. */
  def churnSink(events: DataFrame)(readState: () => DataFrame)(
      writeState: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeState(churnMerge(readState(), graft.ops.Events.churnGrid(batch)))
    }

  /** Read side of [[churnSink]] — LITERALLY the batch op's view. */
  def churnView(state: DataFrame): DataFrame =
    graft.ops.Events.churnView(state)

  /** Merge (h, first_doc) vocabulary-entry partials (twin state of the
    * batch vocab_growth op) — keyed MIN merge. */
  def vocabEntryMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("h")
      .agg(min(col("first_doc")).as("first_doc"))

  /** Merge per-doc shingle-count partials — keyed MAX merge: a doc's
    * count is deterministic, so redelivery is absorbed outright. */
  def vocabDocMerge(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta).groupBy("doc_id")
      .agg(max(col("n_tri")).as("n_tri"))

  /** foreachBatch fold for the Heaps-law saturation curve (twin of the
    * batch vocab_growth op): the doc-id anchors (hence every decile
    * band) move as the crawl streams in, so only the
    * view-over-completed-fold shape tracks the live curve — the
    * "is the crawl saturating" monitor, recomputed at any cut. */
  def vocabSink(docs: DataFrame)(readEntry: () => DataFrame,
      readDocs: () => DataFrame)(writeEntry: DataFrame => Unit,
      writeDocs: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      writeEntry(vocabEntryMerge(readEntry(),
        graft.ops.Audit.vocabEntryGrid(batch)))
      writeDocs(vocabDocMerge(readDocs(),
        graft.ops.Audit.vocabDocGrid(batch)))
    }

  /** Read side of [[vocabSink]] — the batch op's re-banding view. */
  def vocabView(entry: DataFrame, docGrid: DataFrame): DataFrame =
    graft.ops.Audit.vocabView(entry, docGrid)

  /** foreachBatch fold for time-decay attribution (twin of the batch
    * attribution_time_decay op): an ordered fold (the win_ema ring
    * class) carrying the ≤64-click recency ring per user; the batch's
    * purchases are credited through the batch op's own pair stage over
    * ring + batch clicks, so the emitted pair log equals the one-shot
    * join bit-for-bit — with BOUNDED state and per-batch cost, which is
    * the production path at extreme per-user density. */
  def attrSink(events: DataFrame)(readRing: () => DataFrame,
      readOut: () => DataFrame)(writeRing: DataFrame => Unit,
      writeOut: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val (out, ring) = graft.ops.Events.attrFold(readRing(), instantTs(batch))
      writeOut(readOut().unionByName(out))
      writeRing(ring)
    }
}
