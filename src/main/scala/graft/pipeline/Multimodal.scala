package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed in partition-sized batches.
  *
  * Two decoders behind the same `Decoder` seam:
  *   - `ImageIoDecoder` — REAL decode via `javax.imageio` (PNG/JPEG/GIF/
  *     BMP readers ship with the JDK; zero external jars). Video-style
  *     frame sampling rides the multi-image reader API (animated GIF).
  *   - `FakeDecoder` — deterministic synthetic pixels, kept for hermetic
  *     tests and for payloads that are not real images.
  * Exotic codecs (mp4/webm/audio) still need a cluster-side library
  * (JNI ffmpeg or `mapInPandas` + PIL); the seam is where they plug in.
  */
object Multimodal {

  // javax.imageio defaults to DISK-backed stream caches: every
  // createImageInputStream / ImageIO.write spins up a temp FILE per
  // image (File.createTempFile + delete). At corpus scale that is one
  // filesystem round-trip per row for byte arrays that already live in
  // memory — switch the whole JVM to memory-cached streams once, at
  // module init (executors initialize this module when the decoder
  // closure deserializes, so the setting reaches every JVM).
  javax.imageio.ImageIO.setUseCache(false)

  case class ImageMeta(width: Int, height: Int, channels: Int, format: String)
  case class DecodedImage(meta: ImageMeta, pixels: Array[Byte])

  trait Decoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): DecodedImage
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[DecodedImage]
    /** Channel-aware decode: pixels are INTERLEAVED RGB (length
      * 3·w·h, row-major, R then G then B per pixel) — what a
      * CLIP-style downstream featurizer consumes, where the luma
      * plane of [[decodeImage]] is the right input for hashing/dedup.
      * Default derives a synthetic gray-as-RGB from [[decodeImage]]
      * so third-party decoders stay source-compatible.
      */
    def decodeImageRGB(bytes: Array[Byte]): DecodedImage = {
      val g = decodeImage(bytes)
      if (g.meta.width <= 0) g
      else DecodedImage(g.meta,
        g.pixels.flatMap(p => Array(p, p, p)))
    }
  }

  /** BT.601 integer luma of an interleaved-RGB [[DecodedImage]] — the
    * SAME (299r+587g+114b)/1000 arithmetic as the direct gray decode,
    * so `decodeImage(b).pixels` and `lumaOf(decodeImageRGB(b)).pixels`
    * are byte-identical and every luma-based golden is unaffected by
    * the RGB path's existence.
    */
  def lumaOf(rgb: DecodedImage): DecodedImage = {
    val w = rgb.meta.width; val h = rgb.meta.height
    if (w <= 0 || h <= 0 || rgb.pixels.length < 3 * w * h)
      return DecodedImage(ImageMeta(0, 0, 0, "undecodable"),
        Array.emptyByteArray)
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb.pixels(3 * i) & 0xFF
      val g = rgb.pixels(3 * i + 1) & 0xFF
      val b = rgb.pixels(3 * i + 2) & 0xFF
      out(i) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
      i += 1
    }
    DecodedImage(rgb.meta, out)
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

  /** Real JDK image decoder. Pixels come back as the BT.601 integer luma
    * plane (gray8) so downstream feature math is codec-independent;
    * `channels` reports the source color components. Undecodable or
    * truncated bytes → `(0, 0, 0, "undecodable")` with empty pixels — a
    * web-crawl media column is full of corrupt blobs and the pipeline
    * must keep them as rows, not exceptions.
    */
  object ImageIoDecoder extends Decoder {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO

    private val Undecodable = DecodedImage(
      ImageMeta(0, 0, 0, "undecodable"), Array.emptyByteArray)

    private def luma(img: BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      // bulk getRGB: one color-model conversion pass over the raster
      // instead of w·h virtual calls — same sRGB values per pixel
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Byte](w * h)
      var i = 0
      while (i < out.length) {
        val rgb = px(i)
        val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        out(i) = ((299 * r + 587 * g + 114 * b) / 1000).toByte
        i += 1
      }
      out
    }

    private def rgbInterleaved(img: BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val out = new Array[Byte](3 * w * h)
      var i = 0
      while (i < px.length) {
        val rgb = px(i)
        out(3 * i) = ((rgb >> 16) & 0xFF).toByte
        out(3 * i + 1) = ((rgb >> 8) & 0xFF).toByte
        out(3 * i + 2) = (rgb & 0xFF).toByte
        i += 1
      }
      out
    }

    private def decodeWith(bytes: Array[Byte],
        planes: BufferedImage => Array[Byte]): DecodedImage = {
      if (bytes == null || bytes.length < 8) return Undecodable
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Undecodable
          else {
            val r = readers.next()
            r.setInput(iis, true, true)
            try {
              val img = r.read(0)
              DecodedImage(
                ImageMeta(img.getWidth, img.getHeight,
                  img.getColorModel.getNumComponents,
                  r.getFormatName.toLowerCase(java.util.Locale.ROOT)),
                planes(img))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => Undecodable }
    }

    def decodeImage(bytes: Array[Byte]): DecodedImage =
      decodeWith(bytes, luma)

    /** Real interleaved-RGB decode — same reader plumbing and corrupt-
      * blob convention as [[decodeImage]]; `getRGB` normalizes every
      * source color model (palette, gray, CMYK) to sRGB, so the three
      * planes are well-defined for any decodable input.
      */
    override def decodeImageRGB(bytes: Array[Byte]): DecodedImage =
      decodeWith(bytes, rgbInterleaved)

    /** Every `everyN`-th frame of a multi-image container (animated GIF
      * through the JDK reader); single-frame formats yield one frame.
      */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[DecodedImage] = {
      if (bytes == null || bytes.length < 8) return Seq.empty
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq.empty
          else {
            val r = readers.next()
            r.setInput(iis)
            try {
              val n = try math.max(1, r.getNumImages(true))
                catch { case scala.util.control.NonFatal(_) => 1 }
              val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
              (0 until n by math.max(1, everyN)).flatMap { f =>
                try {
                  val img = r.read(f)
                  Some(DecodedImage(ImageMeta(img.getWidth, img.getHeight,
                    img.getColorModel.getNumComponents, fmt), luma(img)))
                } catch { case scala.util.control.NonFatal(_) => None }
              }
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    }
  }

  /** Deterministic real-PNG fixture: an RGB gradient keyed by `seed`,
    * encoded through the JDK PNG writer — REAL bytes for the real decode
    * path without any external image files. Decoded features (dims,
    * channels, luma stats) depend only on the pixel pattern, never on the
    * writer's compression choices.
    */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((seed + 31L * x + 7L * y) % 256).toInt & 0xFF
        val g = ((seed * 3 + 13L * x) % 256).toInt & 0xFF
        val b = ((seed * 5 + 17L * y) % 256).toInt & 0xFF
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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

  /** Channel-aware twin of [[imageFeatures]]: per-channel mean/sd over
    * the interleaved RGB decode — the summary statistics a color-aware
    * downstream featurizer (normalization constants, channel-collapse
    * detection) consumes, where [[imageFeatures]]' luma stats serve the
    * hashing/dedup path. Same per-partition batch contract; corrupt
    * blobs keep their zeroed-meta rows.
    */
  def imageFeaturesRGB(media: DataFrame, decoder: Decoder = FakeDecoder,
                       idCol: String = "id", binCol: String = "bytes")
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder
        it.map { case (id, bytes) =>
          val img = d.decodeImageRGB(bytes)
          val npx = img.meta.width * img.meta.height
          val mean = new Array[Double](3)
          val sd = new Array[Double](3)
          if (npx > 0 && img.pixels.length >= 3 * npx) {
            var c = 0
            while (c < 3) {
              var s = 0.0; var i = 0
              while (i < npx) { s += img.pixels(3 * i + c) & 0xFF; i += 1 }
              val m = s / npx
              var v = 0.0; i = 0
              while (i < npx) {
                val dv = (img.pixels(3 * i + c) & 0xFF) - m
                v += dv * dv; i += 1
              }
              mean(c) = m
              sd(c) = if (npx < 2) 0.0 else math.sqrt(v / (npx - 1))
              c += 1
            }
          }
          (id, img.meta.width, img.meta.height, img.meta.channels,
            img.meta.format, mean(0), mean(1), mean(2),
            sd(0), sd(1), sd(2))
        }
      }.toDF("id", "width", "height", "channels", "format",
        "r_mean", "g_mean", "b_mean", "r_sd", "g_sd", "b_sd")
  }

  /** Bilinear resize of a decoded luma plane — the standard
    * normalize-before-featurize step (thumbnailing for perceptual
    * hashes, fixed input shapes for a vision model's preprocessing).
    * Deterministic pure-integer-in/float-math/round-half-up-out; sample
    * positions use the half-pixel (align-corners=false) convention
    * shared by PIL/OpenCV. Degenerate inputs (undecodable, zero target)
    * return the Undecodable-style empty image.
    */
  def resizeImage(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    val w = img.meta.width; val h = img.meta.height
    if (w <= 0 || h <= 0 || outW <= 0 || outH <= 0 ||
        img.pixels.length < w * h)
      return DecodedImage(ImageMeta(0, 0, 0, "undecodable"),
        Array.emptyByteArray)
    // plane count from the pixel-buffer shape, NOT meta.channels (meta
    // reports the SOURCE color components even for a luma plane): the
    // gray decode carries w·h bytes, the RGB decode 3·w·h interleaved.
    // Per-channel resize runs the identical half-pixel kernel with a
    // channel-strided index, so the planes=1 arithmetic — and every
    // existing luma golden — is byte-for-byte what it was.
    val planes = if (img.pixels.length.toLong >= 3L * w * h) 3 else 1
    val out = new Array[Byte](outW * outH * planes)
    val sx = w.toDouble / outW; val sy = h.toDouble / outH
    val px = img.pixels
    var oy = 0
    while (oy < outH) {
      val fy = (oy + 0.5) * sy - 0.5
      val y0 = math.max(0, math.min(h - 1, math.floor(fy).toInt))
      val y1 = math.min(h - 1, y0 + 1)
      val wy = math.max(0.0, math.min(1.0, fy - y0))
      var ox = 0
      while (ox < outW) {
        val fx = (ox + 0.5) * sx - 0.5
        val x0 = math.max(0, math.min(w - 1, math.floor(fx).toInt))
        val x1 = math.min(w - 1, x0 + 1)
        val wx = math.max(0.0, math.min(1.0, fx - x0))
        var c = 0
        while (c < planes) {
          val p00 = px((y0 * w + x0) * planes + c) & 0xFF
          val p01 = px((y0 * w + x1) * planes + c) & 0xFF
          val p10 = px((y1 * w + x0) * planes + c) & 0xFF
          val p11 = px((y1 * w + x1) * planes + c) & 0xFF
          val v = (p00 * (1 - wx) + p01 * wx) * (1 - wy) +
            (p10 * (1 - wx) + p11 * wx) * wy
          out((oy * outW + ox) * planes + c) =
            math.round(v).toInt.min(255).max(0).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    DecodedImage(ImageMeta(outW, outH, img.meta.channels,
      img.meta.format + "-resized"), out)
  }

  /** media: (id, bytes) → (id, width, height, luma) resized to a fixed
    * shape — decode + bilinear resize per partition batch, the same
    * batch contract as [[imageFeatures]]. The output luma is the
    * binary column a downstream featurizer consumes.
    */
  def resize(media: DataFrame, outW: Int, outH: Int,
             decoder: Decoder = FakeDecoder, idCol: String = "id",
             binCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder
        it.map { case (id, bytes) =>
          val r = resizeImage(d.decodeImage(bytes), outW, outH)
          (id, r.meta.width, r.meta.height, r.pixels)
        }
      }.toDF("id", "width", "height", "luma")
  }

  /** Channel-aware twin of [[resize]]: (id, bytes) → (id, width,
    * height, rgb) with `rgb` the interleaved 3·outW·outH plane a
    * CLIP-style featurizer consumes. Same per-partition batch
    * contract, same half-pixel kernel per channel, same
    * corrupt-rows-stay-rows convention (empty rgb, zero dims).
    */
  def resizeRGB(media: DataFrame, outW: Int, outH: Int,
                decoder: Decoder = FakeDecoder, idCol: String = "id",
                binCol: String = "bytes"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder
        it.map { case (id, bytes) =>
          val r = resizeImage(d.decodeImageRGB(bytes), outW, outH)
          (id, r.meta.width, r.meta.height, r.pixels)
        }
      }.toDF("id", "width", "height", "rgb")
  }

  /** 64-bit perceptual average-hash (aHash) of a decoded luma plane:
    * block means over an 8×8 partition of the image, bit i set when
    * cell i exceeds the grid mean. Invariant to uniform brightness
    * shifts and re-encodes that preserve block ordering — the standard
    * cheap image near-dup signature. Undecodable images (the decoder's
    * zeroed-meta convention) hash to 0.
    */
  def aHash(img: DecodedImage): Long = {
    val w = img.meta.width; val h = img.meta.height
    if (w <= 0 || h <= 0 || img.pixels.length < w * h) return 0L
    val sums = new Array[Double](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val i = by * 8 + x * 8 / w
        sums(i) += (img.pixels(y * w + x) & 0xFF)
        cnts(i) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i =>
      if (cnts(i) == 0) 0.0 else sums(i) / cnts(i))
    var avg = 0.0; means.foreach(avg += _); avg /= 64
    var bits = 0L; var i = 0
    while (i < 64) { if (means(i) > avg) bits |= (1L << i); i += 1 }
    bits
  }

  /** Image near-duplicate pairs: perceptual aHash per image (real
    * decode, per-partition decoder handle), then the engine's shared
    * Hamming rotate-and-prefix bucket join
    * ([[graft.pipeline.Dedup]]) — the multimodal twin of the text
    * SimHash path, no all-pairs. Undecodable blobs hash to 0 and pair
    * only among themselves (hamming 0), which the caller can drop by
    * filtering hash 0.
    */
  def imageNearDup(media: DataFrame, maxHamming: Int = 5,
                   decoder: Decoder = ImageIoDecoder,
                   idCol: String = "id", binCol: String = "bytes",
                   tables: Int = 8, prefixBits: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media.select(col(idCol).cast("long").as("id"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder
        it.map { case (id, b) => (id, aHash(d.decodeImage(b))) }
      }.toDF("id", "sh").cache()
    graft.core.Materialize.releasing(
      Dedup.hammingPairs(hashed, maxHamming, tables, prefixBits),
      Seq(hashed))
  }

  /** Re-encode a PNG with every channel shifted by `delta` (clamped) —
    * the minted "slightly edited re-upload" fixture for image near-dup
    * tests and queries.
    */
  def shiftPng(bytes: Array[Byte], delta: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = src.getWidth; val h = src.getHeight
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val px = src.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      px(i) = (clamp(((rgb >> 16) & 0xFF) + delta) << 16) |
        (clamp(((rgb >> 8) & 0xFF) + delta) << 8) |
        clamp((rgb & 0xFF) + delta)
      i += 1
    }
    out.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
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
