package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout features with their scale properties asserted in the
  * PLAN, not just the values: partitioned writes must prune partitions,
  * bucketed tables must join without a shuffle.
  */
class SourcesLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("csv and json round-trip with explicit schema") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    val cPath = tmp("csv") + "/out"
    val jPath = tmp("json") + "/out"
    Sources.writeCsv(df, cPath)
    Sources.writeJson(df, jPath)
    val c = Sources.csv(spark, cPath, Some(df.schema))
    val j = Sources.json(spark, jPath, Some(df.schema))
    rowSet(c) shouldBe rowSet(df)
    rowSet(j.select("id", "name", "v")) shouldBe rowSet(df)
  }

  test("partitioned write prunes partitions on read (PartitionFilters)") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
    val path = tmp("part") + "/orders"
    Sources.writePartitioned(df, path, Seq("o_orderstatus"))
    val read = spark.read.parquet(path).filter(col("o_orderstatus") === "F")
    val plan = read.queryExecution.executedPlan.toString
    // the predicate must be INSIDE the PartitionFilters list — a plain
    // 'PartitionFilters: []' with a post-scan data filter would full-scan
    plan should include regex """PartitionFilters: \[[^\]]*o_orderstatus"""
    // values survive the layout round trip
    read.count() shouldBe df.filter(col("o_orderstatus") === "F").count()
  }

  test("bucketed tables join WITHOUT a shuffle on the bucket key") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val cust = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
      .select("c_custkey", "c_name")
    val ord = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .withColumnRenamed("o_custkey", "c_custkey")
    Sources.writeBucketed(cust, "b_cust", 4, Seq("c_custkey"))
    Sources.writeBucketed(ord, "b_ord", 4, Seq("c_custkey"))
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("b_cust").join(spark.table("b_ord"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(12).mkString("\n")) {
        plan should not include "Exchange hashpartitioning(c_custkey"
      }
      joined.count() shouldBe
        cust.join(ord, "c_custkey").count()
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS b_cust")
      spark.sql("DROP TABLE IF EXISTS b_ord")
    }
  }
}
