package graft.sources

import graft.SparkFixture
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private val recs = Seq(
    ("warcinfo", "urn:warcinfo", "2026-01-01T00:00:00Z",
      "software: test".getBytes(StandardCharsets.UTF_8)),
    ("request", "https://a.example/1", "2026-01-01T00:00:01Z",
      "GET /1 HTTP/1.1".getBytes(StandardCharsets.UTF_8)),
    ("response", "https://a.example/1", "2026-01-01T00:00:01Z",
      "<html>page one é</html>".getBytes(StandardCharsets.UTF_8)),
    ("response", "https://a.example/2", "2026-01-02T12:30:00Z",
      Array.tabulate(257)(i => (i % 251).toByte)), // binary payload
    ("conversion", "https://a.example/3", "2026-01-03T05:00:00Z",
      "extracted text".getBytes(StandardCharsets.UTF_8)))

  test("parseAll keeps response/conversion, skips warcinfo/request") {
    val parsed = Warc.parseAll(Warc.write(recs))
    assert(parsed.map(_._1) ==
      Seq("https://a.example/1", "https://a.example/2", "https://a.example/3"))
    assert(parsed(0)._3.sameElements(recs(2)._4)) // payload byte-identity
    assert(parsed(1)._3.sameElements(recs(3)._4))
    assert(parsed(1)._2 == "2026-01-02T12:30:00Z")
  }

  test("gzipped multi-member WARC (Common Crawl layout) parses identically") {
    // one gzip member per record, concatenated — CC's .warc.gz layout
    val out = new ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(Warc.write(Seq(r))); gz.finish()
    }
    val parsed = Warc.parseAll(out.toByteArray)
    assert(parsed.map(_._1) == Warc.parseAll(Warc.write(recs)).map(_._1))
    assert(parsed(1)._3.sameElements(recs(3)._4))
  }

  test("response records drop the HTTP envelope, conversion stays raw") {
    val htmlBody = "<html>real page</html>"
    val httpMsg = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "X-Crawl: test\r\n\r\n" + htmlBody).getBytes(StandardCharsets.UTF_8)
    val blob = Warc.write(Seq(
      ("response", "https://h.example/p", "2026-03-01T00:00:00Z", httpMsg),
      ("conversion", "https://h.example/t", "2026-03-01T00:00:01Z",
        "plain text".getBytes(StandardCharsets.UTF_8))))
    val parsed = Warc.parseAll(blob)
    assert(new String(parsed(0)._3, StandardCharsets.UTF_8) == htmlBody)
    assert(new String(parsed(1)._3, StandardCharsets.UTF_8) == "plain text")
    // non-HTTP response payload passes through untouched
    assert(Warc.stripHttpEnvelope("just bytes".getBytes).sameElements(
      "just bytes".getBytes))
  }

  test("Webtext.fromWarc: WARC → page schema with text + lang filled") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warcw").toFile
    val html = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>the quick brown fox and the lazy dog with a cat" +
      "</p></body></html>").getBytes(StandardCharsets.UTF_8)
    Files.write(new java.io.File(dir, "s.warc").toPath, Warc.write(Seq(
      ("response", "https://f.example/en", "2026-04-01T00:00:00Z", html))))
    val pages = graft.pipeline.Webtext.fromWarc(spark, dir.getAbsolutePath)
    val r = pages.select("url", "text", "lang")
      .as[(String, String, String)].head()
    assert(r._1 == "https://f.example/en")
    assert(r._2 == "the quick brown fox and the lazy dog with a cat")
    assert(r._3 == "en")
  }

  test("truncated tail record is dropped, prefix survives") {
    val whole = Warc.write(recs)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 20)
    val parsed = Warc.parseAll(cut)
    // last record (conversion) was cut mid-payload → first two survive
    assert(parsed.map(_._1) ==
      Seq("https://a.example/1", "https://a.example/2"))
  }

  test("Spark read maps to the page schema with byte-identical html") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warc").toFile
    Files.write(new java.io.File(dir, "seg-00000.warc").toPath,
      Warc.write(recs))
    val df = Warc.read(spark, dir.getAbsolutePath)
    assert(df.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = df.orderBy("url")
      .select("url", "html").as[(String, Array[Byte])].collect()
    assert(rows.map(_._1).toSeq ==
      Seq("https://a.example/1", "https://a.example/2", "https://a.example/3"))
    assert(rows(0)._2.sameElements(recs(2)._4))
    val ts = df.orderBy("url").select("warc_ts")
      .as[java.sql.Timestamp].collect()
    assert(ts.forall(_ != null))
  }
}
