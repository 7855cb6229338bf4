package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the engine-portable hash primitive: `h60` (md5 → first 15 hex →
  * BIGINT) must produce the exact integers DuckDB's
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` produces — the whole
  * dedup/fingerprint oracle parity rests on this equality. Expected values
  * below were computed in DuckDB.
  */
class HashPortabilitySpec extends SparkSpec {
  import spark.implicits._

  test("h60 matches DuckDB's md5-derived 60-bit integers") {
    val df = Seq("abc").toDF("s")
    val got = df.select(Text.h60(col("s"))).collect()(0).getLong(0)
    got shouldBe 648541476951500027L // DuckDB: CAST('0x'||substr(md5('abc'),1,15) AS BIGINT)
  }

  test("h60 is non-negative and within 60 bits for arbitrary inputs") {
    val df = (1 to 100).map(i => s"doc $i payload ${i * 31}").toDF("s")
    val vals = df.select(Text.h60(col("s"))).collect().map(_.getLong(0))
    vals.foreach { v =>
      v should be >= 0L
      v should be < (1L << 60)
    }
    vals.distinct.length shouldBe 100 // no collisions on distinct short inputs
  }
}
