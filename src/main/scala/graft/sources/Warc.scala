package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) source — the on-disk format of
  * Common-Crawl-style page corpora, the north rule's input shape.
  *
  * `read` maps WARC response/conversion records onto the engine's page
  * schema `(url, warc_ts, html binary, text, lang)` (BASELINE.json
  * input_hint): `url` ← WARC-Target-URI, `warc_ts` ← WARC-Date,
  * `html` ← the raw record payload bytes (byte-identical — the
  * input_hint invariant), `text`/`lang` left null for the pipeline's
  * own extraction stages.
  *
  * Parsing is per-file on executors (Spark's `binaryFile` source:
  * one task per file, files ≤2 GB — Common Crawl segments are ~1 GB,
  * so one segment = one task is exactly the parallelism a 100 TB crawl
  * wants: ~10^5 segment files spread over the cluster). `.warc.gz` is
  * handled transparently: Common Crawl gzips each record as its own
  * member, and `GZIPInputStream` reads concatenated members natively.
  *
  * Malformed tails/records are skipped, not fatal — a crawl segment
  * with a truncated last record must not kill a 10^5-file read.
  */
object Warc {

  /** One parsed record: kept WARC types are response + conversion
    * (conversion is what Common Crawl's WET text extracts use).
    */
  private val KeptTypes = Set("response", "conversion")

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) => parseAll(bytes) }
      .toDF("url", "warc_ts_s", "html")
      .select(col("url"),
        to_timestamp(col("warc_ts_s")).as("warc_ts"),
        col("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))
  }

  /** Parse every kept record of one (possibly gzipped) WARC file.
    * Returns (url, iso-ts, payload-bytes).
    */
  def parseAll(raw: Array[Byte]): Seq[(String, String, Array[Byte])] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
    val out = Seq.newBuilder[(String, String, Array[Byte])]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      parseRecord(bytes, pos) match {
        case Some((next, rec)) =>
          rec.foreach(out += _)
          pos = next
        case None => ok = false // malformed tail: stop, keep what parsed
      }
    }
    out.result()
  }

  /** Parse one record at `pos`; returns (positionAfterRecord,
    * Some(row) if the record type is kept). None = malformed.
    */
  private def parseRecord(bytes: Array[Byte], pos: Int)
      : Option[(Int, Option[(String, String, Array[Byte])])] = {
    val headEnd = indexOf(bytes, "\r\n\r\n", pos)
    if (headEnd < 0) return None
    val head = new String(bytes, pos, headEnd - pos, StandardCharsets.UTF_8)
    val lines = head.split("\r\n")
    if (!lines.headOption.exists(_.startsWith("WARC/"))) return None
    val hdrs = lines.tail.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase ->
        l.substring(i + 1).trim)
    }.toMap
    val len = hdrs.get("content-length").flatMap(_.toLongOption)
      .getOrElse(return None)
    if (len < 0 || len > Int.MaxValue - headEnd - 4) return None
    val bodyStart = headEnd + 4
    val bodyEnd = bodyStart + len.toInt
    if (bodyEnd > bytes.length) return None
    // each record is terminated by two CRLFs after the payload
    var next = bodyEnd
    while (next + 1 < bytes.length &&
      bytes(next) == '\r' && bytes(next + 1) == '\n') next += 2
    val row =
      if (hdrs.get("warc-type").exists(KeptTypes)) {
        for (url <- hdrs.get("warc-target-uri"); ts <- hdrs.get("warc-date"))
          yield (url, ts,
            java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd))
      } else None
    Some((next, row))
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  /** Inflate all concatenated gzip members (Common Crawl writes one
    * member per record; GZIPInputStream chains them).
    */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 1 << 16)
    val out = new ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](1 << 16)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: EOFException => () } // truncated member: keep prefix
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nb = needle.getBytes(StandardCharsets.US_ASCII)
    var i = from
    val last = hay.length - nb.length
    while (i <= last) {
      var j = 0
      while (j < nb.length && hay(i + j) == nb(j)) j += 1
      if (j == nb.length) return i
      i += 1
    }
    -1
  }

  /** Test/fixture helper: serialize records into WARC/1.0 bytes. */
  def write(records: Seq[(String, String, String, Array[Byte])])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { case (wtype, url, ts, payload) =>
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $wtype\r\n")
        .append(s"WARC-Target-URI: $url\r\n")
        .append(s"WARC-Date: $ts\r\n")
        .append(s"Content-Length: ${payload.length}\r\n")
        .append("\r\n").toString
      out.write(head.getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    }
    out.toByteArray
  }
}
