package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom codegen'd dot-product expression: correctness, nulls,
  * length mismatch, and codegen-path equivalence.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def callDot(a: String, b: String) = {
    VecDot.register(spark)
    call_function(VecDot.name, col(a), col(b))
  }

  test("computes the dot product") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    df.select(callDot("a", "b")).collect()(0).getDouble(0) shouldBe 32.0
  }

  test("shorter array bounds the loop") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0))).toDF("a", "b")
    df.select(callDot("a", "b")).collect()(0).getDouble(0) shouldBe 11.0
  }

  test("null input propagates null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(callDot("a", "b")).collect()(0).get(0) == null)
  }

  test("null ELEMENT propagates null (matches the HOF formulation)") {
    val df = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("a", "b")
    assert(df.select(callDot("a", "b")).collect()(0).get(0) == null)
  }

  test("matches the interpreted HOF formulation on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
    val viaExpr = df.select(callDot("a", "b").as("d")).collect().map(_.getDouble(0))
    val viaHof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("d")).collect().map(_.getDouble(0))
    viaExpr.zip(viaHof).foreach { case (e, h) => e shouldBe h +- 1e-12 }
  }

  test("stays inside whole-stage codegen (no UDF/fallback in the plan)") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val plan = df.select(callDot("a", "b"))
      .queryExecution.executedPlan.toString
    plan should not include "BatchEvalPython"
    plan should not include "ScalaUDF"
  }
}
