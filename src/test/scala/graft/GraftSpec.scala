package graft

/** The library entry point: attach() exposes the SQL surface on an
  * existing session, idempotently, and per-session (newSession isolation).
  */
class GraftSpec extends SparkSpec {

  test("attach registers vec_dot and the UDF surface for SQL text") {
    Graft.attach(spark)
    Graft.attach(spark) // idempotent
    spark.sql("SELECT graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0) shouldBe 11.0
  }

  test("attach works on an isolated newSession") {
    val alt = spark.newSession()
    Graft.attach(alt)
    alt.sql("SELECT graft_vec_dot(array(1.0d), array(5.0d)) AS d")
      .collect()(0).getDouble(0) shouldBe 5.0
  }

  test("Tables converts legacy nanos-as-long event fixtures to µs timestamps") {
    // older driver fixture generations stored events.ts as int64 NANOS
    // (read via the nanosAsLong session flag); the current generation is
    // a real µs timestamp. The loader must serve BOTH: the conditional
    // long→timestamp branch is the one no current fixture exercises.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("legacy_fixture").toString
    Seq((1L, 1704067200123456789L), (2L, 1704067201000000999L))
      .toDF("event_id", "ts").write.parquet(s"$dir/events.parquet")
    val got = Tables(spark, dir, "events")
    got.schema("ts").dataType shouldBe
      org.apache.spark.sql.types.TimestampType
    // ns truncate to µs, never round
    got.orderBy("event_id").collect().map(r => epochUs(r.getTimestamp(1))) shouldBe
      Array(1704067200123456L, 1704067201000000L)
  }
}
