package graft.pipeline

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic HTML → text extraction for the webtext pipeline —
  * the stage that fills the page schema's `text` column from `html`
  * (BASELINE.json input_hint: extracted text must be byte-identical
  * run-to-run, so every rule here is fixed and locale-free).
  *
  * Single forward pass, no regex (a backtracking regex over adversarial
  * crawl HTML is a CPU bomb at 10^12 pages; this is O(len) with a small
  * constant). Rules:
  *   - `<script>`/`<style>`/`<noscript>`/`<template>` bodies dropped
  *     (case-insensitive, until the matching close tag);
  *   - comments `<!-- -->`, doctypes, CDATA and all other tags dropped;
  *     block-level tags (p, div, br, li, tr, h1-h6, …) emit a newline,
  *     inline tags emit nothing;
  *   - entities decoded: the named set the reference corpus actually
  *     contains (amp, lt, gt, quot, apos, nbsp) + decimal/hex numerics;
  *     unknown entities pass through literally;
  *   - whitespace canonicalized: runs of spaces/tabs → one space,
  *     ≥1 newlines (plus surrounding spaces) → one '\n', trimmed ends.
  */
object TextExtract {

  private val Block = Set("p", "div", "br", "li", "ul", "ol", "tr", "td",
    "th", "table", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
    "pre", "section", "article", "header", "footer", "nav", "aside",
    "form", "hr", "dt", "dd", "dl", "figure", "figcaption", "main")
  private val Skip = Set("script", "style", "noscript", "template")

  /** Extract text from UTF-8 HTML bytes. Null/empty-safe. */
  def fromHtml(html: Array[Byte]): String =
    if (html == null) "" else fromHtml(new String(html, StandardCharsets.UTF_8))

  def fromHtml(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val n = html.length
    val out = new java.lang.StringBuilder(n / 4)
    var i = 0
    var skipUntil: String = null // lowercase tag whose close we await

    // real tag end: first unquoted '>' ('>' inside a quoted attribute
    // value is legal HTML and must not terminate the tag)
    def tagEnd(from: Int): Int = {
      var j = from
      var quote: Char = 0
      while (j < n) {
        val ch = html.charAt(j)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        else if (ch == '>') return j + 1
        j += 1
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (skipUntil != null) {
        // inside a raw-text element (script/style/...): HTML parsers only
        // leave on the matching close tag — a bare '<' (e.g. `a<b` in JS)
        // is content, NOT a tag, and must not be tag-parsed.
        val after = i + 2 + skipUntil.length // char right after the name
        if (c == '<' && i + 1 < n && html.charAt(i + 1) == '/' &&
            html.regionMatches(true, i + 2, skipUntil, 0, skipUntil.length) &&
            (after >= n || !html.charAt(after).isLetterOrDigit)) {
          skipUntil = null
          i = tagEnd(i + 2)
        } else i += 1
      } else if (c == '<') {
        // comment / doctype / CDATA?
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' ||
            html.charAt(i + 1) == '?')) {
          i = tagEnd(i + 1)
        } else {
          val close = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (close) i + 2 else i + 1
          var j = nameStart
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          val e = tagEnd(j)
          // self-closing (<script/>) never opens a raw-text body
          val selfClosing = e - 2 >= i && html.charAt(e - 2) == '/'
          if (!close && !selfClosing && Skip(name)) skipUntil = name
          else if (Block(name)) out.append('\n')
          i = e
        }
      } else if (c == '&') {
        val (s, adv) = entity(html, i)
        out.append(s); i += adv
      } else {
        out.append(c); i += 1
      }
    }
    canonWhitespace(out.toString)
  }

  /** Decode one entity at `pos` ('&'); returns (replacement, chars consumed). */
  private def entity(s: String, pos: Int): (String, Int) = {
    // bounded scan: entities are ≤10 chars; an unbounded indexOf would be
    // O(n²) on '&'-dense semicolon-free text (the adversarial-crawl case)
    val limit = math.min(s.length, pos + 12)
    var semi = pos + 1
    while (semi < limit && s.charAt(semi) != ';') semi += 1
    if (semi >= limit || s.charAt(semi) != ';' || semi - pos > 10)
      return ("&", 1)
    val body = s.substring(pos + 1, semi)
    val rep = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => "\u00A0"
      case b if b.length > 1 && b.charAt(0) == '#' =>
        val code =
          try {
            if (b.charAt(1) == 'x' || b.charAt(1) == 'X')
              Integer.parseInt(b.substring(2), 16)
            else Integer.parseInt(b.substring(1))
          } catch { case _: NumberFormatException => -1 }
        if (code >= 0 && code <= 0x10FFFF &&
            !(code >= 0xD800 && code <= 0xDFFF))
          new String(Character.toChars(code))
        else null
      case _ => null
    }
    if (rep == null) ("&", 1) else (rep, semi - pos + 1)
  }

  /** Runs of spaces/tabs → ' '; newline runs (with adjacent spaces) →
    * '\n'; leading/trailing whitespace dropped.
    */
  private def canonWhitespace(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var pendingNl = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r') pendingNl = true
      else if (c == ' ' || c == '\t' || c == '\u00A0') pendingSpace = true
      else {
        if (out.length > 0) {
          if (pendingNl) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingNl = false; pendingSpace = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** Column form: fill `text` from `html` on a page frame (batch or
    * stream — stateless projection).
    */
  def withText(pages: DataFrame): DataFrame = {
    val fn = udf((b: Array[Byte]) => fromHtml(b))
    pages.withColumn("text",
      when(col("text").isNotNull, col("text"))
        .otherwise(fn(col("html"))))
  }
}
