package graft.multimodal

import graft.SparkSpec

/** The multimodal decode stage: real mapPartitions plumbing, stubbed codec.
  */
class DecodeSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, Array[Byte]()),
    (3L, Array.tabulate(1024)(i => (i % 251).toByte)),
  ).toDF("doc_id", "payload")

  test("decode produces fixed-width feature vectors with byte counts") {
    val out = Decode.decode(payloads, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2))).toSeq
      .sortBy(_._1)
    out.map(_._1) shouldBe Seq(1L, 2L, 3L)
    out.map(_._2) shouldBe Seq(11, 0, 1024)
    out.foreach { case (_, _, f) =>
      f.length shouldBe Decode.FeatureDim
      f.foreach { v => v should (be >= 0.0 and be < 1.0) }
    }
  }

  test("decode is deterministic across partitionings (retry/exactly-once safe)") {
    val once = Decode.decode(payloads, "doc_id", "payload")
      .collect().map(_.toString).sorted.toSeq
    val again = Decode.decode(payloads.repartition(3), "doc_id", "payload")
      .collect().map(_.toString).sorted.toSeq
    again shouldBe once
  }

  test("resize emits constant-size payloads regardless of input length") {
    val out = Decode.resize(payloads, "doc_id", "payload", targetBytes = 16)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq.sortBy(_._1)
    out.map(_._2.length) shouldBe Seq(16, 16, 16)
    // deterministic: same input -> same bytes
    val again = Decode.resize(payloads.repartition(2), "doc_id", "payload", 16)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toMap
    out.foreach { case (id, b) => again(id) shouldBe b.toSeq }
  }

  test("frameSample explodes payloads into strided fixed-size frames") {
    val out = Decode.frameSample(payloads, "doc_id", "payload",
        frameBytes = 256, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length)).toSeq
    // only doc 3 (1024 bytes) has frames: 4 frames, stride 2 -> frames 0 and 2
    out shouldBe Seq((3L, 0, 256), (3L, 2, 256))
  }

  test("decode runs on the real documents fixture payloads") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id", "CAST(text AS BINARY) AS payload")
    val out = Decode.decode(docs, "doc_id", "payload")
    out.count() should be > 0L
    out.schema shouldBe Decode.outputSchema
  }
}
