package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Batch decode/feature-extract plumbing for multimodal payloads.
  *
  * The row model: an opaque `binary` payload column (image/audio/video
  * bytes) plus typed metadata. The decode stage maps a partition of rows to
  * feature rows in batches — the Spark-side shape (schema in/out, partition
  * iteration, per-batch amortized codec setup) is REAL and tested; only the
  * codec call itself is stubbed deterministically, because this environment
  * ships no image/audio libraries. Swap [[decodeBatch]]'s body for a JNI /
  * native codec (or route the same schema through `mapInPandas` on a
  * Python-enabled cluster) and nothing else changes.
  *
  * Scale: `mapPartitions` keeps the codec context per-partition (not
  * per-row), the work is embarrassingly parallel, and the output schema is
  * fixed-width — no shuffle introduced by decoding itself.
  */
object Decode {

  val FeatureDim = 8

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** STUB codec: deterministic pseudo-features from the payload bytes (a
    * real build decodes pixels/samples here). Kept pure so results are
    * reproducible across partitionings and retries — the property a real
    * codec must also satisfy for exactly-once semantics. */
  private[multimodal] def decodeBatch(payloads: Iterator[(Long, Array[Byte])]): Iterator[Row] =
    payloads.map { case (id, bytes) =>
      val feats = Array.tabulate(FeatureDim) { i =>
        var acc = 1125899906842597L // FNV-ish deterministic fold, seeded by i
        var j = i
        while (j < bytes.length) { acc = acc * 31 + (bytes(j) & 0xff); j += FeatureDim }
        (acc & 0xffffff).toDouble / 16777216.0
      }
      Row(id, bytes.length, feats.toSeq)
    }

  /** Decode a DataFrame with (`idCol` long, `payloadCol` binary) into
    * feature rows. */
  def decode(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val enc = RowEncoder.encoderFor(outputSchema)
    df.select(idCol, payloadCol).mapPartitions { rows =>
      decodeBatch(rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1))))
    }(enc)
  }

  // ------------------------------------------------------------------
  // resize / frame-sample — the other two standard media stages. Real
  // codecs operate on decoded pixels/samples; these deterministic
  // byte-level stand-ins keep the exact Spark shape (binary in, binary
  // out, narrow per-row map, fixed output size) so swapping in a codec
  // changes only the kernel.
  // ------------------------------------------------------------------

  /** "Resize" a payload to exactly `targetBytes` by averaging fixed-stride
    * byte buckets (the byte-level analog of area-average image resize).
    * Output length is constant per row — the property downstream
    * fixed-width feature stages rely on. */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      targetBytes: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val out = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(out)
    df.select(idCol, payloadCol).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val resized = Array.tabulate(targetBytes) { i =>
          if (bytes.isEmpty) 0.toByte
          else {
            val from = (i.toLong * bytes.length / targetBytes).toInt
            val until = math.max((((i + 1).toLong * bytes.length) / targetBytes).toInt, from + 1)
            var s = 0; var j = from
            while (j < until && j < bytes.length) { s += bytes(j) & 0xff; j += 1 }
            (s / math.max(math.min(until, bytes.length) - from, 1)).toByte
          }
        }
        Row(r.getLong(0), resized)
      }
    }(enc)
  }

  /** Sample every `stride`-th fixed-size frame from a payload — the
    * video-frame-sampling shape: one input row explodes into its sampled
    * frames with indices, each a fixed-size binary. */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val out = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(out)
    df.select(idCol, payloadCol).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).map { f =>
          Row(id, f, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }
    }(enc)
  }
}
