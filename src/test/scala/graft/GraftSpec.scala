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
}
