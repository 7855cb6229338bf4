package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic properties of the corpus-audit operators — invariants the
  * DuckDB hash compare can't express (it proves engine agreement, not
  * that the contract itself is right).
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("pack_sequences: no batch exceeds the budget except single-doc overflows") {
    val batches = SparkEntry.queries("pack_sequences")(spark, dir)
      .groupBy("source", "batch_id")
      .agg(sum("n_tok").as("tok"), count(lit(1)).as("n_docs"))
      .collect()
    batches should not be empty
    // greedy running-sum packing admits one overflow doc per batch
    // boundary, so a batch is over budget only via its LAST doc; a batch
    // of ≥2 docs whose total exceeds budget+max-single-doc would mean the
    // cumsum assignment is wrong
    val maxDoc = SparkEntry.queries("pack_sequences")(spark, dir)
      .agg(max("n_tok")).collect()(0).getLong(0)
    batches.foreach { r =>
      withClue(s"batch ${r.get(0)}/${r.get(1)}: ") {
        r.getLong(2) should be <= (512L + maxDoc)
      }
    }
  }

  test("pack_sequences: batch ids are dense from 0 within each source") {
    val perSource = SparkEntry.queries("pack_sequences")(spark, dir)
      .groupBy("source").agg(min("batch_id").as("mn"), max("batch_id").as("mx"),
        countDistinct("batch_id").as("n"))
      .collect()
    perSource.foreach { r =>
      r.getLong(1) shouldBe 0L
      r.getLong(3) shouldBe (r.getLong(2) + 1)
    }
  }

  test("repetition_filter: dup_ratio stays in [0, 1) and keep matches the threshold") {
    val rows = SparkEntry.queries("repetition_filter")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      val ratio = r.getDouble(3)
      ratio should be >= 0.0
      ratio should be < 1.0
      r.getBoolean(4) shouldBe (ratio <= 0.1)
    }
  }

  test("decontaminate catches a planted benchmark replica and keeps clean docs clean") {
    // plant: one training doc that IS a benchmark doc's text (replica),
    // one training doc of vocabulary no benchmark doc contains
    val docs = graft.Tables(spark, dir, "documents")
    val bench = docs.filter(col("source") === "src0")
      .orderBy("doc_id").limit(1).collect()(0)
    val planted = Seq(
      (900001L, bench.getString(1), "en", "srcX", bench.getString(1).length.toLong),
      (900002L, "zzqa zzqb zzqc zzqd zzqe zzqf zzqg zzqh", "en", "srcX", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_decon").toString
    try {
      docs.unionByName(planted).write.parquet(s"$tmp/documents.parquet")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { n =>
        graft.Tables(spark, dir, n).write.parquet(s"$tmp/$n.parquet")
      }
      val verdicts = SparkEntry.queries("decontaminate")(spark, tmp)
        .filter(col("doc_id") >= 900000L)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      verdicts(900001L) shouldBe true
      verdicts(900002L) shouldBe false
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(tmp)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("outlier_filter: every flagged row is above its group threshold and ~0.5% of rows are flagged") {
    val flagged = SparkEntry.queries("outlier_filter")(spark, dir).collect()
    flagged should not be empty
    flagged.foreach { r =>
      r.getDouble(3) should be > r.getDouble(4) // price > p995
    }
    val total = graft.Tables(spark, dir, "lineitem").count()
    // p99.5 gate ⇒ ≈0.5% tail per group; allow generous slack for ties
    flagged.length.toDouble / total should be < 0.02
  }

  test("sink_scd2: exactly one open row per key, no spurious versions, history closed at the batch date") {
    val rows = SparkEntry.queries("sink_scd2")(spark, dir).collect()
    val byKey = rows.groupBy(_.getLong(0))
    // every key has exactly ONE current (valid_to IS NULL) row
    byKey.foreach { case (k, rs) =>
      withClue(s"key $k: ") { rs.count(_.isNullAt(3)) shouldBe 1 }
    }
    // an identical incoming row must NOT create a version: odd keys in
    // 401..499 arrive unchanged → single open row, no history
    byKey.filter { case (k, _) => k >= 401 && k <= 499 && k % 2 == 1 }
      .foreach { case (k, rs) =>
        withClue(s"unchanged key $k: ") { rs.length shouldBe 1 }
      }
    // a changed key (even, 400..500) has exactly its closed original +
    // the new current version, closed AT the batch date
    byKey.filter { case (k, _) => k >= 400 && k <= 500 && k % 2 == 0 }
      .foreach { case (k, rs) =>
        withClue(s"changed key $k: ") {
          rs.length shouldBe 2
          rs.filter(!_.isNullAt(3)).map(_.getDate(3).toString) shouldBe Array("2024-06-01")
        }
      }
    // brand-new keys (501..600) insert as current only
    byKey.filter { case (k, _) => k >= 501 && k <= 600 }.foreach { case (k, rs) =>
      withClue(s"new key $k: ") {
        rs.length shouldBe 1
        rs.head.isNullAt(3) shouldBe true
        rs.head.getDate(2).toString shouldBe "2024-06-01"
      }
    }
  }

  test("search_rrf: fused scores decompose into the shortlist rank terms") {
    val rows = SparkEntry.queries("search_rrf")(spark, dir).collect()
    rows should have length 10
    rows.foreach { r =>
      val rKw = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rVec = if (r.isNullAt(2)) None else Some(r.getInt(2))
      // a fused row exists only via at least one shortlist membership
      (rKw.isDefined || rVec.isDefined) shouldBe true
      val expected = rKw.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rVec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      r.getDouble(3) shouldBe expected
      rKw.foreach(_ should be >= 1)
      rVec.foreach(_ should be >= 1)
    }
  }

  test("profile_stats: counts are consistent with the source table") {
    val rows = SparkEntry.queries("profile_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.Tables(spark, dir, "documents")
    rows("lang").getLong(2) shouldBe docs.select("lang").distinct().count()
    rows("doc_id").getLong(1) shouldBe 0L
    rows("source").getString(3) should startWith("src")
  }
}
