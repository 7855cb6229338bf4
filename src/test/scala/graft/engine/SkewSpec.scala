package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted aggregation/join must be RESULT-equivalent to the unsalted plans
  * — salting only changes the partitioning, never the answer.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (80% of rows) + a tail
  private def skewed = (1 to 500).map { i =>
    val k = if (i % 5 != 0) "hot" else s"k${i % 17}"
    (k, i.toLong, i * 0.5)
  }.toDF("k", "n", "v")

  test("saltedAgg equals plain groupBy for algebraic aggregates") {
    val plain = skewed.groupBy("k")
      .agg(sum("n").as("sn"), count(lit(1)).as("c"), max("v").as("mx"))
    val salted = Skew.saltedAgg(skewed, Seq("k"), salts = 8)(
      stage1 = Seq(sum("n").as("sn"), count(lit(1)).as("c"), max("v").as("mx")),
      stage2 = Seq(sum("sn").as("sn"), sum("c").as("c"), max("mx").as("mx")))
    rowSet(salted) shouldBe rowSet(plain)
  }

  test("saltedJoin equals plain join, including tail keys") {
    val dim = Seq(("hot", "H"), ("k3", "T3"), ("k11", "T11")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select("k", "n", "label")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select("k", "n", "label")
    rowSet(salted) shouldBe rowSet(plain)
    salted.count() shouldBe plain.count()
  }

  test("saltedJoin rejects right/full outer (would duplicate unmatched rows)") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(skewed, dim, Seq("k"), salts = 4, "full")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(skewed, dim, Seq("k"), salts = 4, "right")
  }

  test("saltedJoin left-outer keeps unmatched big-side rows exactly once") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 4, "left")
    salted.count() shouldBe skewed.count()
    salted.filter(col("label").isNull).count() shouldBe
      skewed.filter(col("k") =!= "hot").count()
  }
}
