package graft.pipeline

import graft.SparkFixture
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class TextExtractSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("tags stripped, blocks become newlines, inline tags vanish") {
    val html =
      """<html><head><title>T</title></head>
        |<body><h1>Head line</h1>
        |<p>Para <b>bold</b> and <i>italic</i>.</p>
        |<div>Second<br>third</div></body></html>""".stripMargin
    assert(TextExtract.fromHtml(html) ==
      "T\nHead line\nPara bold and italic.\nSecond\nthird")
  }

  test("script/style/noscript bodies dropped entirely") {
    val html = "<p>keep</p><script>var x = '<p>no</p>';</script>" +
      "<style>p { color: red }</style><noscript>nope</noscript><p>end</p>"
    assert(TextExtract.fromHtml(html) == "keep\nend")
  }

  test("comments, doctype, entities") {
    val html = "<!DOCTYPE html><!-- secret --><p>a &amp; b &lt;c&gt; " +
      "&quot;q&quot; &#65;&#x42; &nbsp; d &unknown; &</p>"
    assert(TextExtract.fromHtml(html) ==
      "a & b <c> \"q\" AB d &unknown; &")
  }

  test("whitespace canonicalization is deterministic") {
    val html = "<p>  a\t\tb  </p>\n\n\n<p>   </p><p>c</p>"
    assert(TextExtract.fromHtml(html) == "a b\nc")
    // idempotent: extracting already-extracted text changes nothing
    val once = TextExtract.fromHtml(html)
    assert(TextExtract.fromHtml(once) == once)
  }

  test("raw-text bodies with '<' survive (real crawl JS/CSS)") {
    // bare '<' in JS must not be tag-parsed past the real close tag
    assert(TextExtract.fromHtml(
      "<script>if(a<b)x=1;</script><p>article text</p>") == "article text")
    // '<!--' inside a script likewise
    assert(TextExtract.fromHtml(
      "<script>a <!-- b</script><p>kept</p>") == "kept")
    // '</scripty>' is not the close tag; '</script >' is
    assert(TextExtract.fromHtml(
      "<script>x</scripty></script><p>ok</p>") == "ok")
    assert(TextExtract.fromHtml(
      "<script>x</script ><p>ok</p>") == "ok")
  }

  test("self-closing script tag does not eat the document") {
    assert(TextExtract.fromHtml(
      "<script src=\"a.js\"/><p>all the content</p>") == "all the content")
  }

  test("'>' inside a quoted attribute does not terminate the tag") {
    assert(TextExtract.fromHtml(
      "<img alt=\"x > y\"><p>real</p>") == "real")
    assert(TextExtract.fromHtml(
      "<a href='q?a>b'>link</a> text") == "link text")
  }

  test("'&'-dense semicolon-free text stays linear") {
    val s = "x&" * 200000
    val t0 = System.nanoTime()
    val out = TextExtract.fromHtml(s)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(out.length == s.length && ms < 2000.0,
      s"took $ms ms — entity scan must be bounded")
  }

  test("malformed html never throws and is deterministic") {
    val cases = Seq("<p", "<", "</", "<script>never closed",
      "<!-- open comment", "a & b;", "&#xZZ;", "<p>&#55296;</p>", "")
    for (h <- cases) {
      val a = TextExtract.fromHtml(h)
      assert(a == TextExtract.fromHtml(h), s"non-deterministic on '$h'")
    }
    assert(TextExtract.fromHtml("<script>never closed") == "")
    assert(TextExtract.fromHtml(null: String) == "")
    assert(TextExtract.fromHtml(null: Array[Byte]) == "")
  }

  test("withText fills null text from html, keeps existing text") {
    import spark.implicits._
    val pages = Seq(
      ("u1", "<p>from html</p>".getBytes(StandardCharsets.UTF_8),
        null.asInstanceOf[String]),
      ("u2", "<p>ignored</p>".getBytes(StandardCharsets.UTF_8), "already"))
      .toDF("url", "html", "text")
    val r = TextExtract.withText(pages).orderBy("url")
      .select("text").as[String].collect()
    assert(r.toSeq == Seq("from html", "already"))
  }

  test("WARC → extract chain: byte-identical html in, stable text out") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warcx").toFile
    val recs = Seq(("response", "https://w.example/a",
      "2026-02-01T00:00:00Z",
      "<html><body><p>Hello &amp; welcome</p></body></html>"
        .getBytes(StandardCharsets.UTF_8)))
    java.nio.file.Files.write(
      new java.io.File(dir, "seg.warc").toPath,
      graft.sources.Warc.write(recs))
    val pages = TextExtract.withText(
      graft.sources.Warc.read(spark, dir.getAbsolutePath))
    val row = pages.select("url", "text").as[(String, String)].head()
    assert(row == ("https://w.example/a", "Hello & welcome"))
  }
}
