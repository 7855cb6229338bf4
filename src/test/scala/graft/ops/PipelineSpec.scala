package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => fsize}

import graft.SparkSpec

/** Curation-op invariants beyond the oracle gate: chunk coverage/overlap
  * arithmetic, sampling determinism and subset-ness, and — because the
  * fixture word-soup contains no PII — the pii_redact patterns applied to
  * text that actually contains emails/IPs/long numbers.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chunk_split: chunk count and sizes follow the stride arithmetic") {
    val chunks = graft.SparkEntry.queries("chunk_split")(spark, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("n_tokens").as("max_tok"),
        min("n_tokens").as("min_tok"))
      .collect()
    val nTok = graft.SparkEntry.queries("token_count")(spark, dir)
      .select("doc_id", "n_ws").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.foreach { r =>
      val (id, n) = (r.getLong(0), nTok(r.getLong(0)))
      // starts at 0, 40, 80, … while start < n
      val expected = (n + 39) / 40
      withClue(s"doc $id with $n tokens: ") {
        r.getLong(1) shouldBe expected
        r.getInt(2) should be <= 50  // max chunk size
        r.getInt(3) should be >= 1   // tail chunk non-empty
      }
    }
  }

  test("sample_stratified: deterministic subset with per-stratum thinning") {
    val q = graft.SparkEntry.queries("sample_stratified")
    val a = q(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = q(spark, dir).collect().map(_.getLong(0)).toSeq
    a shouldBe b // repeat run → identical sample
    val all = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(nLong(_, 0)).toSet
    a.toSet.subsetOf(all) shouldBe true
    a.size should be < all.size // it actually thins
  }

  test("sample_per_group: exactly min(k, stratum size) per language") {
    val perLang = graft.SparkEntry.queries("sample_per_group")(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
    val sizes = graft.Tables(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { r =>
      r.getLong(1) shouldBe math.min(20L, sizes(r.getString(0)))
    }
  }

  test("pii_redact patterns catch real PII and redact it") {
    val df = Seq(
      (1L, "contact me at alice.smith+x@example.co.uk today"),
      (2L, "server 192.168.100.1 responded"),
      (3L, "account 123456789 closed"),
      (4L, "clean text with no pii at all"),
      (5L, "a@b.io and 10.0.0.1 and 9876543")).toDF("doc_id", "text")
    val redacted = regexp_replace(regexp_replace(regexp_replace(col("text"),
      Pipeline.EmailRe, "<EMAIL>"), Pipeline.Ipv4Re, "<IP>"),
      Pipeline.LongNumRe, "<NUM>")
    val out = df.select(
        col("doc_id"),
        fsize(regexp_extract_all(col("text"), lit(Pipeline.EmailRe), lit(0))).as("n_email"),
        fsize(regexp_extract_all(col("text"), lit(Pipeline.Ipv4Re), lit(0))).as("n_ip"),
        fsize(regexp_extract_all(col("text"), lit(Pipeline.LongNumRe), lit(0))).as("n_num"),
        redacted.as("red"))
      .orderBy("doc_id").collect()
    out.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))) shouldBe Array(
      (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0), (1, 1, 1))
    out(0).getString(4) shouldBe "contact me at <EMAIL> today"
    out(1).getString(4) shouldBe "server <IP> responded"
    out(2).getString(4) shouldBe "account <NUM> closed"
    out(4).getString(4) shouldBe "<EMAIL> and <IP> and <NUM>"
  }

  test("text_filter: keep flag is exactly reason == ok") {
    val rows = graft.SparkEntry.queries("text_filter")(spark, dir).collect()
    rows.foreach { r =>
      r.getBoolean(3) shouldBe (r.getString(2) == "ok")
    }
  }

  test("sample_balance: every class keeps exactly min-class-count docs, chosen by hash order") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = graft.Tables(spark, dir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (nLong(r, 0), r.getString(1)))
    val k = raw.groupBy(_._2).values.map(_.length).min
    val expect = raw.groupBy(_._2).toSeq.flatMap { case (lang, docs) =>
      docs.sortBy { case (id, _) => (h60(s"bal:$id"), id) }.take(k)
        .map { case (id, _) => (id, lang) }
    }.toSet
    val got = graft.SparkEntry.queries("sample_balance")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    got.toSet shouldBe expect
    // balanced by construction: every language contributes exactly k
    got.groupBy(_._2).values.map(_.length).toSet shouldBe Set(k)
    // and the cap binds (some language was actually downsampled)
    raw.groupBy(_._2).values.map(_.length).max should be > k
  }

  test("sample_weighted: membership recomputes from the hash and the length-derived rate") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val raw = graft.Tables(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (nLong(r, 0), nLong(r, 1)))
    val expect = raw.flatMap { case (id, nc) =>
      val p = math.min(nc * 10, 8000L)
      if (h60(s"wsamp:$id") % 10000 < p) Some(id -> ((nc, p))) else None
    }.toMap
    val got = graft.SparkEntry.queries("sample_weighted")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expect
    // the weighting is real: kept docs are longer on average than the corpus
    val kept = got.values.map(_._1)
    kept.sum.toDouble / kept.size should be >
      raw.map(_._2).sum.toDouble / raw.length
  }
}
