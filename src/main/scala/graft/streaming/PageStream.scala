package graft.streaming

import graft.core.Tiling
import graft.pipeline.{Dedup, SynthGeo, Webtext}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the web-page table shape
  * (url, warc_ts, html, text, lang) — the ingest half of the north-rule
  * pipeline expressed on a stream.
  *
  * Both transforms are pure column expressions / stateful typed maps, so
  * batch and stream share one code path (`spark.readStream` or
  * `spark.read` alike — tested via MemoryStream equality).
  */
object PageStream {

  /** Streaming geocode + tile: identical expressions to the batch
    * `Webtext.geocode` (md5-slice hash → point → cell). Works unchanged
    * on a streaming DataFrame because it is stateless projection.
    */
  def geocodeTile(pages: DataFrame,
                  cellSize: Double = SynthGeo.CellW): DataFrame =
    Webtext.geocode(pages, cellSize)
      .withColumn("tile", Tiling.cellIdCol(col("x"), col("y"), cellSize * 10))

  /** Streaming point-in-polygon: geocode the page stream, then run the
    * SAME `SpatialJoin.pip` the batch pipeline uses against a STATIC
    * polygon layer. Both physical strategies are streaming-legal: the
    * broadcast path is a stateless flatMap over a driver-built cell
    * index of the static side, and the partitioned path is a
    * stream-static inner equi-join on (cell[, salt]) followed by a
    * stateless exact refine — no state store, no watermark needed.
    * Output matches batch: (gid, pid).
    */
  def pipStream(pages: DataFrame, polys: DataFrame,
                cellSize: Double = SynthGeo.CellW,
                broadcastLimitBytes: Long =
                  graft.pipeline.SpatialJoin.DefaultBroadcastLimit,
                nSalt: Int = 1): DataFrame =
    graft.pipeline.SpatialJoin.pip(Webtext.geocode(pages, cellSize), polys,
      cellSize, broadcastLimitBytes, nSalt)

  /** Streaming per-domain rollup: watermarked tumbling-window page
    * counts and text volume per host — the streaming face of
    * `Webtext.domainStats` (the crawl-monitoring feed: per-domain
    * ingest rates drive politeness budgets and mix dashboards). Host
    * parse is the same positional split as batch; the watermark bounds
    * window state, so a perpetual crawl stream holds only the open
    * windows per active host, never history. Batch/stream share the
    * code path (windowed agg is batch-legal; MemoryStream equality
    * spec).
    */
  def domainRollup(pages: DataFrame, windowDur: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    pages
      .withColumn("host", Webtext.hostOf(col("url")))
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowDur), col("host"))
      .agg(count(lit(1)).as("n_pages"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .select(col("window.start").as("win_start"), col("host"),
        col("n_pages"), col("total_chars"))

  /** Streaming vocabulary heavy hitters: the Misra-Gries sketch
    * ([[graft.catalyst.HeavyHittersAgg]]) over a watermarked event-time
    * window — per-window trending tokens with FIXED aggregation state.
    * A token-keyed streaming `groupBy(window, token)` would hold one
    * state-store row per distinct token per in-flight window (unbounded
    * on a web stream); here the state is ONE serialized capacity-entry
    * sketch per window, and the aggregate's binary buffer is exactly
    * what the state store persists between micro-batches — the MG merge
    * rule doubles as the cross-batch accumulation, so the
    * N/(capacity+1) bound holds over the whole window no matter how
    * the batches slice it. Batch frames run the same code path
    * (`withWatermark` is a no-op on batch).
    */
  def vocabHeavyHitters(pages: DataFrame, capacity: Int = 4096,
                        windowDur: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .select(col("warc_ts"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("token"))
      .groupBy(window(col("warc_ts"), windowDur))
      .agg(graft.catalyst.HeavyHittersAgg.heavyHitters(capacity)(
        col("token")).as("hh"))
      .select(col("window.start").as("win_start"),
        explode(col("hh.entries")).as("e"))
      .select(col("win_start"), col("e.token").as("token"),
        col("e.count").as("n"))

  /** Streaming quality gate: the fastText-style hashed linear scorer
    * ([[graft.pipeline.Curation.hashedLinearScore]]) over a page
    * stream — token explode, broadcast model join, per-page re-agg
    * keyed by (url, warc_ts). The watermark bounds aggregation state to
    * the in-flight pages; zero-token pages emit one null-bucket row so
    * EVERY page is scored (score = bias — a streaming aggregate cannot
    * left-join the page universe back in). Batch and stream share the
    * code path (`withWatermark` is a no-op on batch frames).
    */
  def scoreStream(pages: DataFrame, weights: DataFrame, dim: Int = 1024,
                  bias: Double = 0.0,
                  watermark: String = "2 hours"): DataFrame = {
    val toks = filter(split(coalesce(col("text"), lit("")), " "),
      t => length(t) > 0)
    pages
      .withWatermark("warc_ts", watermark)
      .select(col("url"), col("warc_ts"),
        explode(when(size(toks) === 0,
            array(lit(null).cast("string"))).otherwise(toks)).as("tok"))
      .select(col("url"), col("warc_ts"),
        graft.pipeline.Curation.tokenBucket(col("tok"), dim).as("bucket"))
      .join(broadcast(weights.select(
          col("bucket").cast("long").as("bucket"),
          col("weight").cast("double").as("w"))),
        Seq("bucket"), "left")
      .groupBy(col("url"), col("warc_ts"))
      .agg(sum(coalesce(col("w"), lit(0.0))).as("s"))
      .select(col("url"), col("warc_ts"),
        round(col("s") + bias, 6).as("score"))
      .select(col("url"), col("warc_ts"), col("score"),
        round(lit(1.0) / (lit(1.0) + exp(-col("score"))), 6).as("prob"))
  }

  case class Page(url: String, text: String)
  case class SeenState(firstUrl: String, n: Long)
  case class DedupOut(url: String, simhash: Long, is_duplicate: Boolean,
                      first_url: String)

  /** Streaming near-dup filter: simhash each page, key state by the
    * 64-bit simhash (exact-bucket variant of the batch rotate-prefix
    * design — the stream analogue dedups within a bucket as pages
    * arrive). Emits every page tagged is_duplicate, carrying the first
    * url seen for its bucket. State: one (firstUrl, count) per distinct
    * simhash. Pass `ttlMs > 0` to bound state at web scale via a
    * processing-time timeout (note: timeout mode makes the engine run
    * continuous timeout-check micro-batches between data; leave 0 for
    * unbounded state when the key space is bounded).
    */
  def simhashDedup(pages: Dataset[Page], shingleSize: Int = 2,
                   ttlMs: Long = 0L): Dataset[DedupOut] = {
    import pages.sparkSession.implicits._
    val timeoutMode =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    pages.map(p => (p.url, Dedup.simhashOf(
        if (p.text == null) "" else p.text, shingleSize)))
      .groupByKey(_._2)
      .flatMapGroupsWithState[SeenState, DedupOut](
        OutputMode.Append(), timeoutMode) {
        (sh: Long, rows: Iterator[(String, Long)],
         state: GroupState[SeenState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.map(_._1).toSeq.sorted // deterministic batch order
            var cur = state.getOption
            val out = sorted.map { url =>
              cur match {
                case Some(s) =>
                  cur = Some(SeenState(s.firstUrl, s.n + 1))
                  DedupOut(url, sh, is_duplicate = true, s.firstUrl)
                case None =>
                  cur = Some(SeenState(url, 1))
                  DedupOut(url, sh, is_duplicate = false, url)
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            }
            out.iterator
          }
      }
  }
}
