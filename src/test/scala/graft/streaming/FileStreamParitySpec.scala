package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming over the REAL parquet fixtures (file source, not
  * MemoryStream): the streaming tumbling aggregate over `events` must equal
  * the identical batch computation — stream/batch parity is the property
  * that lets the same op definitions serve both modes.
  */
class FileStreamParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("file-source streaming tumbling aggregate equals the batch result") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // raw on-disk schema (ts is nanos-as-long); same µs conversion Tables does
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    def convert(df: DataFrame): DataFrame =
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    // the file source wants a directory: stage the fixture file into one
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val stream = convert(
      spark.readStream.schema(rawSchema).parquet(staged.toString))
    // decimal-exact sums: raw double sums are aggregation-order dependent,
    // and streaming/batch combine partials in different orders
    def dsumV = sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .cast("double").as("sum_value")
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsumV)
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("t_file_parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("t_file_parity").collect()
        .map(_.toSeq).toSet
      val batch = convert(spark.read.parquet(s"$dir/events.parquet"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumV)
        .select(col("window.start").as("ws"), col("event_type"), col("n"),
          col("sum_value"))
        .collect().map(_.toSeq).toSet
      streamed shouldBe batch
      streamed should not be empty
    } finally q.stop()
  }
}
