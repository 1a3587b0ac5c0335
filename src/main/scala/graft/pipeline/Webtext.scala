package graft.pipeline

import graft.core.Tiling
import graft.stats.Lisa
import graft.weights.KnnWeights
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BASELINE.json north-rule pipeline over the Common-Crawl-style
  * web-page table `(url, warc_ts, html, text, lang)`:
  *
  *   ingest → geocode (url → point) → tile encode → PIP spatial join
  *   against a polygon layer → kNN weights → local Moran (999 perms,
  *   seed 123456789), every stage checkpointed with per-partition
  *   lineage so a killed run resumes mid-weights-build.
  *
  * Invariant (input_hint): `text` stays byte-identical per `url` end to
  * end — geometry is carried in separate columns, the page payload is
  * never rewritten; `verifyTextIdentity` proves it via full-column
  * checksums.
  */
object Webtext {

  /** Deterministic synthetic webpages from the documents table (no
    * external data): url minted from doc_id, html wraps the text bytes,
    * text passed through verbatim.
    */
  def synthWebpages(spark: SparkSession, dir: String): DataFrame = {
    SynthGeo.table(spark, dir, "documents").select(
      concat(lit("https://site-"), (col("doc_id") % 97).cast("string"),
        lit(".example/page/"), col("doc_id").cast("string")).as("url"),
      timestamp_seconds(lit(1704067200L) + col("doc_id") % 86400)
        .as("warc_ts"),
      encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")),
        "UTF-8").cast("binary").as("html"),
      col("text"),
      col("lang"))
  }

  /** Geocode urls to points: stable url hash → uniform coords in the
    * synthetic admin-layer domain. (gid, url, x, y, cell).
    *
    * The hash is md5 sliced into non-overlapping hex ranges (x: 1-8,
    * y: 9-16, gid: 17-31 → 60-bit id) — md5 produces identical hex text
    * in any engine, so the whole derivation replays in ANSI SQL and the
    * downstream Moran query gets a DuckDB oracle. Throughput-equivalent
    * to a 64-bit hash at scale (one digest per row, codegen'd).
    */
  def geocode(pages: DataFrame, cellSize: Double = SynthGeo.CellW): DataFrame =
    pages.select(col("url"), col("text"))
      .withColumn("__h", md5(col("url").cast("binary")))
      .withColumn("gid",
        conv(substring(col("__h"), 17, 15), 16, 10).cast("long"))
      .withColumn("x",
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % 18000L)
          .cast("double") / 100.0)
      .withColumn("y",
        (conv(substring(col("__h"), 9, 8), 16, 10).cast("long") % 18000L)
          .cast("double") / 100.0)
      .withColumn("cell", Tiling.cellIdCol(col("x"), col("y"), cellSize))
      .select("gid", "url", "x", "y", "cell", "text")

  /** Ingest real Common-Crawl-style WARC segments into the page schema:
    * parse records (`sources.Warc`), extract `text` from `html`
    * (`TextExtract`, deterministic), fill `lang` by the n-gram language
    * ID. The result feeds `geocode`/`runAll` exactly like the synthetic
    * pages — and `text` is derived from byte-identical `html`, so the
    * per-url byte-identity invariant holds end to end.
    */
  def fromWarc(spark: SparkSession, path: String): DataFrame = {
    val langFn = udf((t: String) =>
      TextAnalysis.langOf(if (t == null) "" else t)._1)
    val withText = TextExtract.withText(graft.sources.Warc.read(spark, path))
    withText.withColumn("lang", langFn(col("text")))
  }

  case class Result(joined: DataFrame, weights: DataFrame, moran: DataFrame)

  /** Full checkpointed pipeline. `ckptRoot` holds stage outputs; re-run
    * with an existing root = resume (completed stages are read back, not
    * recomputed).
    */
  def runAll(spark: SparkSession, dir: String, ckptRoot: String,
             k: Int = 4, permutations: Int = 999,
             /** shuffle salt for the PIP stage's partitioned path —
               * raise above 1 when the page geography has hot cells
               * (SpatialJoin.pip docs); result-identical by test */
             pipSalt: Int = 1): Result = {
    val pages = Checkpoint.stage(spark, ckptRoot, "pages") {
      synthWebpages(spark, dir)
    }
    val geocoded = Checkpoint.stage(spark, ckptRoot, "geocoded") {
      geocode(pages)
    }
    val polys = Checkpoint.stage(spark, ckptRoot, "polygons") {
      SynthGeo.partPolygons(spark, dir).withColumnRenamed("gid", "pid")
    }
    val joined = Checkpoint.stage(spark, ckptRoot, "joined") {
      SpatialJoin.pip(geocoded, polys, SynthGeo.CellW, nSalt = pipSalt)
        .join(geocoded, Seq("gid"))
        .select("gid", "url", "pid", "cell", "text")
    }
    val weights = Checkpoint.stage(spark, ckptRoot, "weights") {
      KnnWeights.build(geocoded, KnnWeights.Conf(k = k,
        cellSize = Some(SynthGeo.CellW)))
    }
    val moran = Checkpoint.stage(spark, ckptRoot, "moran") {
      // analysis variable: deterministic page statistic (text length)
      val vals = geocoded.select(col("gid"),
        length(col("text")).cast("double").as("value"))
      Lisa.localMoran(vals, weights,
        Lisa.Conf(permutations = permutations, seed = 123456789))
    }
    Result(joined, weights, moran)
  }

  /** Per-domain corpus statistics — the aggregation behind crawl-corpus
    * domain mixing (per-host page counts and volumes drive sampling
    * weights). Host parsed positionally from the url
    * (`scheme://host/...` → 3rd `/`-separated field, replayable in ANSI
    * SQL). ONE hash aggregate with map-side partials — a hot domain
    * (the classic crawl skew) concentrates on one reducer key only
    * AFTER partial aggregation, so skew cost is bounded by reducer-side
    * merge of per-partition partials, not by raw row count.
    */
  /** Host of a url column: 3rd `/`-separated field of `scheme://host/…`
    * — the ONE host-parse convention shared by the batch domain stats
    * and the streaming rollup (parity between them is spec-asserted, so
    * the parse must not fork).
    */
  def hostOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split_part(url, lit("/"), lit(3))

  def domainStats(pages: DataFrame): DataFrame =
    pages.select(hostOf(col("url")).as("host"),
        length(col("text")).cast("long").as("len"), col("lang"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_pages"), sum("len").as("total_chars"),
        count_distinct(col("lang")).as("n_langs"))

  /** Canonical form of a url for url-level dedup — the normalizations a
    * crawl pipeline applies before treating two fetches as the same
    * page: drop the `#fragment`, drop tracking query params
    * (`utm_*`/`fbclid`/`gclid`, re-legalizing the surviving query
    * string), lowercase scheme+authority (path and query keep their
    * case), strip default `:80`/`:443` ports, strip trailing path
    * slashes (only when no query survives — a trailing `/` inside a
    * query value is payload). Pure codegen'd regex/string expressions,
    * replayable in SQL (q83's DuckDB oracle runs the same five steps).
    * Known limit: a literal `&` in a query-less path is read as a query
    * separator — not reachable from RFC-3986-encoded urls.
    */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "[?&](utm_[A-Za-z]+|fbclid|gclid)=[^&]*", "")
    // if the first surviving separator is '&' (its '?' went with a
    // tracking param), promote it; then drop a dangling '?'
    val fixedQ = regexp_replace(
      regexp_replace(noTrack, "^([^?&]*)&", "$1?"), "\\?$", "")
    val authPat = "^[^/?#]*//[^/?#]*"
    val c = concat(
      regexp_replace(lower(regexp_extract(fixedQ, authPat, 0)),
        ":(80|443)$", ""),
      regexp_replace(fixedQ, authPat, ""))
    when(c.contains("?"), c).otherwise(regexp_replace(c, "/+$", ""))
  }

  /** Url-level dedup: one row per canonical url with the variant count
    * and the kept representative — (curl, n_pages, n_urls, keep_url,
    * first_ts epoch-seconds). `keep_url` is the lexicographically
    * smallest raw variant (deterministic at any parallelism);
    * `first_ts` the earliest fetch. ONE hash aggregate keyed by the
    * canonical url with map-side partials — the shuffle carries ~one
    * row per distinct page per partition, not the crawl.
    */
  def urlDedup(pages: DataFrame): DataFrame =
    pages.select(canonicalUrl(col("url")).as("curl"), col("url"),
        col("warc_ts"))
      .groupBy("curl")
      .agg(count(lit(1)).as("n_pages"),
        count_distinct(col("url")).as("n_urls"),
        min(col("url")).as("keep_url"),
        unix_timestamp(min(col("warc_ts"))).as("first_ts"))

  /** Deterministic messy-url pages for exercising [[canonicalUrl]]: the
    * same synthetic page minted under six url spellings (plain,
    * uppercase authority, tracking params, fragment, trailing slash,
    * explicit :443) keyed by doc_id, several docs per page so dedup has
    * real groups. Replays in ANSI SQL (q83 oracle).
    */
  def synthMessyPages(spark: SparkSession, dir: String): DataFrame = {
    val docs = SynthGeo.table(spark, dir, "documents")
    val page = (col("doc_id") % 200).cast("long")
    val site = (page % 97).cast("string")
    val pageS = page.cast("string")
    val base = concat(lit("https://site-"), site, lit(".example/page/"), pageS)
    val variant = col("doc_id") % 6
    val url = when(variant === 0, base)
      .when(variant === 1,
        concat(lit("HTTPS://SITE-"), site, lit(".EXAMPLE/page/"), pageS))
      .when(variant === 2,
        concat(base, lit("?utm_source=feed&utm_campaign=x")))
      .when(variant === 3, concat(base, lit("#section-2")))
      .when(variant === 4, concat(base, lit("/")))
      .otherwise(concat(lit("https://site-"), site,
        lit(".example:443/page/"), pageS))
    docs.select(url.as("url"),
      timestamp_seconds(lit(1704067200L) + col("doc_id") % 86400)
        .as("warc_ts"))
  }

  /** Byte-identity invariant: per-url text checksums agree between input
    * pages and the joined output (input_hint requirement).
    */
  def verifyTextIdentity(pages: DataFrame, joined: DataFrame): Boolean = {
    // joined is a subset of pages (points outside every polygon drop);
    // identity must hold on the subset: join back and compare text bytes
    val mismatch = joined.select("url", "text").distinct()
      .join(pages.select(col("url"), col("text").as("t_in")), "url")
      .filter(col("text") =!= col("t_in") || col("text").isNull =!= col("t_in").isNull)
      .limit(1).count()
    mismatch == 0
  }
}
