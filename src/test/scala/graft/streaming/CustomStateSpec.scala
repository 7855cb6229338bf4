package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.CustomState.{Event, sessionsWithCap}

/** flatMapGroupsWithState sessionizer: cap-triggered close, gap close, and
  * bounded state via event-time timeout.
  */
class CustomStateSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, v: Double) =
    Event(id, user, "c", Timestamp.valueOf(t), v, "{}")

  private def run(batches: Seq[Seq[Event]], cap: Double): Seq[(Long, Long, Double, String)] = {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionsWithCap(input.toDS(), cap)
      .writeStream.format("memory").queryName("t_cap").outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("t_cap").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4), r.getString(5)))
    } finally q.stop()
  }

  test("session closes immediately when the value cap trips") {
    val out = run(Seq(Seq(
      ev(1, 1, "2024-01-01 10:00:00", 40.0),
      ev(2, 1, "2024-01-01 10:05:00", 70.0))), cap = 100.0)
    out shouldBe Seq((1L, 2L, 110.0, "cap"))
  }

  test("gap closes the previous session; new one accumulates separately") {
    val out = run(Seq(Seq(
      ev(1, 2, "2024-01-01 10:00:00", 10.0),
      ev(2, 2, "2024-01-01 11:00:00", 20.0))), cap = 1e9)
    // first session closed by the 1h gap; second still open (no output yet)
    out shouldBe Seq((2L, 1L, 10.0, "gap"))
  }

  test("a straggler behind watermark+gap neither kills the query nor creates state") {
    // Batch 1 drives the watermark to 11:50 (10-min delay). Batch 2 delivers
    // a user-2 event at 10:00, behind the watermark. Pinned behavior (Spark
    // 4 microbatch): FlatMapGroupsWithStateExec filters watermark-late rows
    // BEFORE the state function, so the straggler is dropped — no user-2
    // session ever, no crash. (sessionsWithCap additionally clamps its
    // timeout to watermark+1 as defense in depth for execution paths
    // without that filter.)
    val out = run(Seq(
      Seq(ev(1, 1, "2024-01-01 12:00:00", 1.0)),
      Seq(ev(2, 2, "2024-01-01 10:00:00", 5.0)), // late straggler — dropped
      Seq(ev(3, 1, "2024-01-01 13:00:00", 1.0)),
      Seq(ev(4, 1, "2024-01-01 14:00:00", 1.0))), cap = 1e9)
    out.filter(_._1 == 2L) shouldBe empty
    // the in-watermark sessions still close normally
    out.count(_ == ((1L, 1L, 1.0, "gap"))) shouldBe 2
  }

  test("runs on a BATCH dataset, where no watermark exists to clamp against") {
    // flatMapGroupsWithState is also a batch API; withWatermark is erased
    // there and getCurrentWatermarkMs THROWS — the clamp must not call it
    // unguarded. The third event leaves a session OPEN at end-of-data,
    // which is exactly the path that sets a timeout.
    implicit val s = spark
    import spark.implicits._
    val ds = Seq(
      ev(1, 1, "2024-01-01 10:00:00", 1.0),
      ev(2, 1, "2024-01-01 10:05:00", 2.0),  // sum 3.0 >= cap → "cap" close
      ev(3, 1, "2024-01-01 11:30:00", 0.5)). // new session, left open
      toDS()
    val out = sessionsWithCap(ds, 2.5).collect()
    out.map(_.reason) should contain("cap")
  }

  test("per-user state is independent") {
    val out = run(Seq(Seq(
      ev(1, 10, "2024-01-01 10:00:00", 60.0),
      ev(2, 11, "2024-01-01 10:00:00", 10.0),
      ev(3, 11, "2024-01-01 10:01:00", 60.0))), cap = 50.0)
    out.toSet shouldBe Set((10L, 1L, 60.0, "cap"), (11L, 2L, 70.0, "cap"))
  }
}
