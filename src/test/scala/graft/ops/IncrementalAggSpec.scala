package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** The incremental-aggregation invariant on data the fixtures don't have:
  * NULL event times must land in exactly one slice, so merged partials
  * equal the full recompute.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("history+delta partials merge to the full aggregate, nulls included") {
    val cutoff = Timestamp.valueOf("2024-01-15 00:00:00")
    val events = Seq(
      (Some(Timestamp.valueOf("2024-01-10 00:00:00")), "a", 1.0),
      (Some(Timestamp.valueOf("2024-01-20 00:00:00")), "a", 2.0),
      (Option.empty[Timestamp], "a", 4.0), // NULL ts must not be dropped
      (Some(Timestamp.valueOf("2024-01-14 23:59:59")), "b", 8.0),
    ).toDF("ts", "event_type", "value")

    def partial(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).as("dsum"))
    val merged = partial(events.filter(col("ts") < lit(cutoff)))
      .unionByName(partial(events.filter(col("ts") >= lit(cutoff) || col("ts").isNull)))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n"), sum(col("dsum")).cast("double").as("s"))
    val full = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("s"))
    rowSet(merged) shouldBe rowSet(full)
    rowSet(merged).find(_.head == "a").get shouldBe Seq("a", 3L, 7.0)
  }
}
