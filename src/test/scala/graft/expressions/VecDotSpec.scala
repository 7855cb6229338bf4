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

  test("codegen compiles with NON-nullable array inputs (no silent fallback)") {
    // CreateArray over literals → ArrayType(containsNull=false), nullable=false:
    // the codegen must not emit an assignment to the FalseLiteral isNull.
    // fallback=false turns a codegen compile error into a test failure
    // instead of a silent interpreted fallback.
    withSqlConf("spark.sql.codegen.fallback" -> "false",
        "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      val df = Seq(1).toDF("i")
      val out = df.select(
        call_function(VecDot.name,
          array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d"))
      out.schema("d").nullable shouldBe false
      out.collect()(0).getDouble(0) shouldBe 11.0
    }
  }

  test("nullable=true when elements can be null even if children are not") {
    // array(nullableCol) is itself non-nullable but containsNull=true; a null
    // element must surface as a null RESULT under a nullable=true schema —
    // not null out of a declared-non-null column.
    val df = Seq((Some(1.0), 2.0), (None, 3.0)).toDF("x", "y")
    val out = df.select(
      call_function(VecDot.name, array(col("x")), array(col("y"))).as("d"))
    out.schema("d").nullable shouldBe true
    val got = out.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    got(0) shouldBe 2.0
    assert(got(1) == null)
  }

  private def withSqlConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("stays inside whole-stage codegen (no UDF/fallback in the plan)") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val plan = df.select(callDot("a", "b"))
      .queryExecution.executedPlan.toString
    plan should not include "BatchEvalPython"
    plan should not include "ScalaUDF"
  }
}
