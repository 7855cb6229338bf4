package graft.engine

import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** Property-style tests for the load paths (SURVEY §5.2 #3): idempotence of
  * insert-if-absent and upsert, and upsert key-uniqueness, over arbitrary
  * small batches drawn from ScalaCheck generators with a FIXED seed (each
  * case runs real Spark jobs, so we sample few, deterministic cases rather
  * than the full scalatestplus forAll machinery).
  */
class SinkPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0, 5)
    name <- Gen.oneOf("a", "b", "c")
    v <- Gen.choose(0, 3)
  } yield (k, name, v)

  private val batchGen = Gen.listOfN(8, rowGen)

  /** Deterministic samples from a generator (fixed seed). */
  private def samples(n: Int): Seq[(List[(Int, String, Int)], List[(Int, String, Int)])] = {
    val seed0 = rng.Seed(42L)
    (0 until n).map { i =>
      val s = (0 until i).foldLeft(seed0)((s, _) => s.next)
      (batchGen.pureApply(Gen.Parameters.default, s),
        batchGen.pureApply(Gen.Parameters.default, s.slide))
    }
  }

  test("insertIfAbsent is idempotent for any batch") {
    samples(5).foreach { case (existing, incoming) =>
      val ex = existing.toDF("k", "name", "v").distinct()
      val inc = incoming.toDF("k", "name", "v")
      val once = Sinks.insertIfAbsent(ex, inc)
      val twice = Sinks.insertIfAbsent(once, inc)
      withClue(s"ex=$existing inc=$incoming: ") {
        rowSet(twice) shouldBe rowSet(once)
      }
    }
  }

  test("upsert tiebreak is partition- and arrival-order-independent") {
    // The all-remaining-columns-desc tiebreak (Sinks.scala) is load-bearing:
    // the reference's "later row wins" is arrival order, which a distributed
    // merge cannot see — so when two incoming rows for one key TIE on
    // orderCol, the winner must be a pure function of row VALUES, never of
    // partitioning or input order. The generator's narrow domains (k 0-5,
    // v 0-3) make such ties common; assert non-vacuity, then permute the
    // input every way a cluster could (reversed arrival, co-prime partition
    // counts, single partition) and require bit-identical output.
    samples(6).foreach { case (existing, incoming) =>
      val ex = existing.toDF("k", "name", "v")
        .groupBy("k").agg(
          org.apache.spark.sql.functions.first("name").as("name"),
          org.apache.spark.sql.functions.first("v").as("v"))
      val inc = incoming.toDF("k", "name", "v")
      val base = rowSet(Sinks.upsert(ex, inc, keys = Seq("k"), orderCol = "v"))
      Seq(
        incoming.reverse.toDF("k", "name", "v"),
        inc.repartition(7),
        incoming.reverse.toDF("k", "name", "v").repartition(3),
        inc.coalesce(1)
      ).foreach { permuted =>
        withClue(s"ex=$existing inc=$incoming: ") {
          rowSet(Sinks.upsert(ex, permuted, keys = Seq("k"), orderCol = "v")) shouldBe base
        }
      }
    }
    // non-vacuity: at least one sampled batch must actually exercise the
    // tiebreak (two rows, same key, same orderCol value, different payload)
    val hasTie = samples(6).exists { case (_, incoming) =>
      incoming.groupBy(r => (r._1, r._3)).exists(_._2.map(_._2).distinct.size > 1)
    }
    assert(hasTie, "generator no longer produces orderCol ties — widen domains")
  }

  test("upsert is idempotent and leaves at most one row per key") {
    samples(5).foreach { case (existing, incoming) =>
      val ex = existing.toDF("k", "name", "v")
        .groupBy("k").agg(
          org.apache.spark.sql.functions.first("name").as("name"),
          org.apache.spark.sql.functions.first("v").as("v"))
      val inc = incoming.toDF("k", "name", "v")
      val once = Sinks.upsert(ex, inc, keys = Seq("k"), orderCol = "v")
      val twice = Sinks.upsert(once, inc, keys = Seq("k"), orderCol = "v")
      withClue(s"ex=$existing inc=$incoming: ") {
        rowSet(twice) shouldBe rowSet(once)
        val keys = once.select("k").collect().map(_.getInt(0)).toSeq
        keys.distinct.size shouldBe keys.size
      }
    }
  }
}
