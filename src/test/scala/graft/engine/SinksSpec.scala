package graft.engine

import graft.SparkSpec

/** Load-path semantics (reference R13/R14/R16 — ETLProcess.java:161-287,
  * 388-466): whole-row insert-if-absent, keyed last-writer-wins upsert,
  * including the ADVICE round-1 edge cases (orderCol inside the destination
  * schema; deterministic tiebreak on orderCol ties).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def ex = Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "name", "bal")

  test("append keeps duplicates (plain INSERT path)") {
    val inc = Seq((2, "b", 20.0), (3, "c", 30.0)).toDF("k", "name", "bal")
    val out = Sinks.append(ex, inc)
    out.count() shouldBe 4
    rowSet(out) shouldBe Set(Seq(1, "a", 10.0), Seq(2, "b", 20.0), Seq(3, "c", 30.0))
      .union(Set(Seq(2, "b", 20.0))) // set collapses the dup; count() above proves it
  }

  test("insertIfAbsent matches on ALL columns, not keys (reference :447-452)") {
    val inc = Seq(
      (2, "b", 20.0),  // exact duplicate -> skipped
      (2, "b", 99.0),  // same key, different bal -> inserted (whole-row match)
      (3, "c", 30.0),  // new -> inserted
    ).toDF("k", "name", "bal")
    rowSet(Sinks.insertIfAbsent(ex, inc)) shouldBe Set(
      Seq(1, "a", 10.0), Seq(2, "b", 20.0), Seq(2, "b", 99.0), Seq(3, "c", 30.0))
  }

  test("insertIfAbsent dedups within the incoming batch (reference per-row loop)") {
    val inc = Seq((3, "c", 30.0), (3, "c", 30.0)).toDF("k", "name", "bal")
    Sinks.insertIfAbsent(ex, inc).count() shouldBe 3
  }

  test("insertIfAbsent is idempotent") {
    val inc = Seq((3, "c", 30.0)).toDF("k", "name", "bal")
    val once = Sinks.insertIfAbsent(ex, inc)
    val twice = Sinks.insertIfAbsent(once, inc)
    rowSet(twice) shouldBe rowSet(once)
  }

  test("upsert: last writer wins per key, new keys inserted (reference :388-427)") {
    val inc = Seq(
      (2, "b2", 21.0, 1), // older version for k=2
      (2, "b3", 22.0, 2), // newer version for k=2 -> wins
      (3, "c", 30.0, 1),  // new key -> insert
    ).toDF("k", "name", "bal", "v")
    val out = Sinks.upsert(ex, inc, keys = Seq("k"), orderCol = "v")
    rowSet(out) shouldBe Set(
      Seq(1, "a", 10.0), Seq(2, "b3", 22.0), Seq(3, "c", 30.0))
  }

  test("upsert keeps orderCol when it IS a destination column (ADVICE r1)") {
    val exV = Seq((1, "a", 5)).toDF("k", "name", "v")
    val inc = Seq((1, "a1", 6), (1, "a2", 7)).toDF("k", "name", "v")
    val out = Sinks.upsert(exV, inc, keys = Seq("k"), orderCol = "v")
    out.columns.toSeq shouldBe Seq("k", "name", "v")
    rowSet(out) shouldBe Set(Seq(1, "a2", 7))
  }

  test("upsert tiebreak on equal orderCol is deterministic (ADVICE r1)") {
    val inc = Seq((2, "x", 1.0, 1), (2, "y", 2.0, 1)).toDF("k", "name", "bal", "v")
    val expected = rowSet(Sinks.upsert(ex, inc, keys = Seq("k"), orderCol = "v"))
    // same input, different partitioning -> same winner
    val out2 = Sinks.upsert(ex, inc.repartition(7), keys = Seq("k"), orderCol = "v")
    rowSet(out2) shouldBe expected
  }

  test("upsert is idempotent on the same incoming batch") {
    val inc = Seq((2, "b2", 21.0, 1), (3, "c", 30.0, 1)).toDF("k", "name", "bal", "v")
    val once = Sinks.upsert(ex, inc, keys = Seq("k"), orderCol = "v")
    val twice = Sinks.upsert(once, inc, keys = Seq("k"), orderCol = "v")
    rowSet(twice) shouldBe rowSet(once)
  }
}
