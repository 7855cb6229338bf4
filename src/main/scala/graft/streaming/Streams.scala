package graft.streaming

import org.apache.spark.sql.DataFrame
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

  /** Tumbling 1h windows per event_type (twin of stream_tumbling). */
  def tumbling(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1h windows every 15 minutes (twin of stream_sliding). */
  def sliding(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("n"), col("sum_value"))

  /** Gap-based session windows per user, 30 min gap (twin of stream_session).
    * Sessions close once the watermark passes their end — append-mode output.
    */
  def session(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("sum_value"))

  /** Drop duplicate events by event_id within the watermark horizon (twin of
    * stream_dedup). `dropDuplicatesWithinWatermark` keeps state only for the
    * watermark window — bounded state for an unbounded stream. */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

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
    val c = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
    // joinType=left_outer emits unmatched purchases (NULL click) once the
    // watermark proves no qualifying click can still arrive
    p.join(c, col("p_user") === col("c_user")
        && col("cts") <= col("pts")
        && col("cts") > col("pts") - expr(s"INTERVAL $window"), joinType)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        (unix_millis(col("pts").cast("timestamp")) - unix_millis(col("cts").cast("timestamp"))).as("delay_ms"))
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
}
