package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed in partition-sized batches.
  *
  * The decode step itself is STUBBED (no codec libraries in this
  * container): `Decoder` is the seam where a real implementation (JNI
  * ffmpeg/libjpeg, or `mapInPandas` + PIL on a PySpark cluster) plugs in;
  * `FakeDecoder` produces deterministic synthetic pixels/samples so the
  * Spark-side plumbing — schema, partitioning, batch shape, downstream
  * feature aggregation — is real and tested end-to-end.
  */
object Multimodal {

  case class ImageMeta(width: Int, height: Int, channels: Int, format: String)
  case class DecodedImage(meta: ImageMeta, pixels: Array[Byte])

  trait Decoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): DecodedImage
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[DecodedImage]
  }

  /** Deterministic fake: "decodes" to an 8x8 grayscale whose pixels are a
    * keyed hash stream of the input bytes — stable across runs/partitions.
    */
  object FakeDecoder extends Decoder {
    def decodeImage(bytes: Array[Byte]): DecodedImage = {
      val h0 = if (bytes == null) 0L
        else Dedup.fnv1a(new String(bytes.take(64), "ISO-8859-1"), 11L)
      val px = Array.tabulate(64)(i =>
        ((h0 >>> (i % 56)) & 0xFF).toByte)
      DecodedImage(ImageMeta(8, 8, 1, "fake-gray8"), px)
    }
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[DecodedImage] = {
      val n = if (bytes == null) 0 else math.max(1, bytes.length / 1024)
      (0 until n by math.max(1, everyN)).map { f =>
        decodeImage(if (bytes == null) null
          else bytes.drop(f * 16))
      }
    }
  }

  /** media: (id long, bytes binary) → per-item image features.
    * Batch shape: one partition = one decode batch; the decoder is
    * instantiated once per partition (the mapInPandas batch contract).
    */
  def imageFeatures(media: DataFrame, decoder: Decoder = FakeDecoder,
                    idCol: String = "id", binCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-partition handle
        it.map { case (id, bytes) =>
          val img = d.decodeImage(bytes)
          val px = img.pixels.map(b => (b & 0xFF).toDouble)
          val mean = if (px.isEmpty) 0.0 else px.sum / px.length
          val sd = if (px.length < 2) 0.0
            else math.sqrt(px.map(v => (v - mean) * (v - mean)).sum / (px.length - 1))
          (id, img.meta.width, img.meta.height, img.meta.channels,
            img.meta.format, mean, sd)
        }
      }.toDF("id", "width", "height", "channels", "format",
        "pixel_mean", "pixel_sd")
  }

  /** Frame sampling for video-ish payloads: (id, bytes) → one row per
    * sampled frame with its features — the explode-shaped half of the
    * multimodal contract.
    */
  def frameSample(media: DataFrame, everyN: Int = 2,
                  decoder: Decoder = FakeDecoder,
                  idCol: String = "id", binCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder
        it.flatMap { case (id, bytes) =>
          d.sampleFrames(bytes, everyN).zipWithIndex.map { case (img, fi) =>
            val px = img.pixels.map(b => (b & 0xFF).toDouble)
            val mean = if (px.isEmpty) 0.0 else px.sum / px.length
            (id, fi, img.meta.width, img.meta.height, mean)
          }
        }
      }.toDF("id", "frame", "width", "height", "pixel_mean")
  }
}
