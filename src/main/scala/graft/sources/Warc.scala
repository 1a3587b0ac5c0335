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
  * Parsing is per-file on executors through the streaming DataSource V2
  * ([[WarcDataSource]]): one segment file = one input partition —
  * exactly the parallelism a 100 TB crawl wants (~10^5 segment files
  * spread over the cluster) — with records decoded incrementally off
  * the open file stream, so neither the compressed segment nor the
  * decompressed stream is ever materialized (no 2 GB cap; task memory
  * is bounded by one record's payload). `.warc.gz` is handled
  * transparently: Common Crawl gzips each record as its own member, and
  * `GZIPInputStream` reads concatenated members natively.
  *
  * Malformed tails/records are skipped, not fatal — a crawl segment
  * with a truncated last record must not kill a 10^5-file read.
  */
object Warc {

  /** One parsed record: kept WARC types are response + conversion
    * (conversion is what Common Crawl's WET text extracts use).
    */
  private val KeptTypes = Set("response", "conversion")

  /** Read WARC files through the streaming DataSource V2
    * ([[WarcDataSource]], short name "warc"): one file = one input
    * partition, records decoded incrementally off the open file stream —
    * the compressed segment is never materialized, so there is no 2 GB
    * file cap and task memory is bounded by ONE record's payload.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)
      .select(col("url"),
        to_timestamp(col("warc_ts_s")).as("warc_ts"),
        col("html"),
        lit(null).cast("string").as("text"),
        lit(null).cast("string").as("lang"))

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Incrementally parse kept records off an open (possibly gzipped)
    * WARC stream. LAZY: each `next()` reads exactly one record off the
    * stream, so memory is bounded by one record's payload regardless of
    * file size — the contract the DSv2 reader and any flatMap caller
    * rely on. The caller owns closing the underlying stream.
    * `label` names the stream (file path) in truncation warnings.
    */
  def records(in0: java.io.InputStream, label: String = "<stream>")
      : Iterator[(String, String, Array[Byte])] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(maybeGunzip(in0), 1 << 16))
    new Iterator[(String, String, Array[Byte])] {
      private var nextRec: (String, String, Array[Byte]) = _
      private var done = false
      private var parsed = 0L
      private def advance(): Unit =
        while (nextRec == null && !done) {
          try readRecord(in) match {
            case Parsed(Some(r)) => nextRec = r; parsed += 1
            case Parsed(None)    => () // skipped type
            case Eof             => done = true
            case Malformed =>
              done = true // truncated tail: keep parsed
              log.warn(s"WARC $label: malformed record after $parsed " +
                "parsed records; stopping at truncated tail")
          } catch {
            // DATA corruption (bad gzip member, truncated stream) is
            // tolerated — keep what parsed, a damaged segment must not
            // kill a 10^5-file read. TRANSPORT errors (connection reset
            // on a live HDFS/S3 stream) must PROPAGATE so the task
            // fails and Spark retries it — swallowing them would
            // silently truncate the segment. Caveat (logged, not
            // swallowed silently): a transport-level premature EOF is
            // indistinguishable here from a truncated gzip member —
            // both surface as EOFException from the inflater — so every
            // EOF-truncation is WARN'd with the stream label and record
            // count, making a silently shortened segment observable in
            // executor logs even though the task itself succeeds.
            case e: java.util.zip.ZipException =>
              done = true
              log.warn(s"WARC $label: corrupt gzip member after $parsed " +
                s"parsed records (${e.getMessage}); keeping parsed prefix")
            case e: EOFException =>
              done = true
              log.warn(s"WARC $label: unexpected EOF after $parsed parsed " +
                s"records (${e.getMessage}); keeping parsed prefix — if " +
                "this is a live-stream transport EOF the segment is " +
                "truncated, re-read the file")
          }
        }
      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): (String, String, Array[Byte]) = {
        advance()
        if (nextRec == null) throw new NoSuchElementException("WARC EOF")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Parse every kept record of one in-memory (possibly gzipped) WARC
    * blob — the hermetic-test twin of the streaming path. Lazy: the
    * returned iterator decodes one record per `next()`.
    */
  def parseAll(raw: Array[Byte]): Iterator[(String, String, Array[Byte])] =
    records(new ByteArrayInputStream(raw))

  /** Transparent member-wise gunzip: Common Crawl gzips each record as
    * its own member and GZIPInputStream reads concatenated members
    * natively. Detection peeks 2 bytes (pushback), so plain WARC streams
    * pass through untouched.
    */
  private[sources] def maybeGunzip(in: java.io.InputStream): java.io.InputStream = {
    val pb = new java.io.PushbackInputStream(in, 2)
    val b1 = pb.read(); val b2 = pb.read()
    if (b2 >= 0) pb.unread(b2)
    if (b1 >= 0) pb.unread(b1)
    if (b1 == 0x1f && b2 == 0x8b) new GZIPInputStream(pb, 1 << 16) else pb
  }

  private sealed trait ReadResult
  private case class Parsed(rec: Option[(String, String, Array[Byte])])
      extends ReadResult
  private case object Eof extends ReadResult
  private case object Malformed extends ReadResult

  /** Read one CRLF-terminated header line; null at EOF. Bytes are
    * UTF-8-decoded (ISO 28500 §4: WARC header fields are UTF-8), so a
    * WARC-Target-URI with non-ASCII bytes survives intact rather than
    * being mojibaked by per-byte char casts.
    */
  private def readLine(in: java.io.InputStream): String = {
    val buf = new ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  private def readRecord(in: java.io.DataInputStream): ReadResult = {
    // skip inter-record blank lines, find the version line
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return Eof
    if (!line.startsWith("WARC/")) return Malformed
    val hdrs = scala.collection.mutable.HashMap.empty[String, String]
    line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0)
        hdrs(line.substring(0, i).trim.toLowerCase) = line.substring(i + 1).trim
      line = readLine(in)
    }
    if (line == null) return Malformed
    val len = hdrs.get("content-length").flatMap(_.toLongOption)
      .getOrElse(return Malformed)
    if (len < 0) return Malformed
    val keep = hdrs.get("warc-type").exists(KeptTypes) &&
      hdrs.contains("warc-target-uri") && hdrs.contains("warc-date") &&
      len <= Int.MaxValue - 16 // single >2GB record: stream past it
    if (!keep) { skipFully(in, len); return Parsed(None) }
    val payload = new Array[Byte](len.toInt)
    try in.readFully(payload)
    catch { case _: EOFException => return Malformed }
    val body =
      if (hdrs("warc-type") == "response") stripHttpEnvelope(payload)
      else payload
    Parsed(Some((hdrs("warc-target-uri"), hdrs("warc-date"), body)))
  }

  private def skipFully(in: java.io.InputStream, n: Long): Unit = {
    var left = n
    val buf = new Array[Byte](1 << 16)
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      if (r < 0) return
      left -= r
    }
  }

  /** WARC `response` records carry a full HTTP message
    * (Content-Type: application/http): status line + headers + body.
    * The page bytes are the body — drop through the first blank line.
    * Records whose payload is not an HTTP message pass through as-is.
    */
  private[sources] def stripHttpEnvelope(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
      !(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' &&
        payload(3) == 'P' && payload(4) == '/')) return payload
    var i = 0
    val n = payload.length
    while (i + 3 < n) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, n)
      i += 1
    }
    payload // headers never terminated: keep raw rather than drop bytes
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
