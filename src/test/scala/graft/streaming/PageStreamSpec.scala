package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, regexp_extract}
import org.scalatest.funsuite.AnyFunSuite

class PageStreamSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("streaming geocode+tile equals the batch projection") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val pages = (1 to 100).map(i => (s"https://s/$i", s"text body $i"))
    val mem = MemoryStream[(String, String)]
    mem.addData(pages)
    val q = PageStream.geocodeTile(mem.toDF().toDF("url", "text"))
      .writeStream.format("memory").queryName("geostream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("geostream").orderBy("gid").collect()
    val batch = PageStream.geocodeTile(pages.toDF("url", "text"))
      .orderBy("gid").collect()
    assert(streamed.sameElements(batch) && streamed.length == 100)
  }

  test("streaming domain rollup equals the batch windowed aggregation") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    val pages = (1 to 120).map { i =>
      (s"https://site-${i % 5}.example/p/$i",
        new java.sql.Timestamp(t0 + i * 60000L), // 2 hours of minutes
        s"body of page $i")
    }
    val mem = MemoryStream[(String, java.sql.Timestamp, String)]
    mem.addData(pages)
    val sdf = mem.toDF().toDF("url", "warc_ts", "text")
    val q = PageStream.domainRollup(sdf)
      .writeStream.format("memory").queryName("domainroll")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("domainroll")
      .orderBy("win_start", "host").collect()
    val batch = PageStream.domainRollup(
        pages.toDF("url", "warc_ts", "text"))
      .orderBy("win_start", "host").collect()
    assert(streamed.sameElements(batch))
    // 120 minutes starting mid-hour → 3 hourly windows × 5 hosts
    assert(streamed.length == 15, s"${streamed.length}")
  }

  test("streaming vocab heavy hitters equals batch token counts " +
      "per window, state bounded by capacity") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    // 2 hourly windows; vocabulary per window <= 40 << capacity 64, so
    // the sketch is exact and the batch groupBy is the oracle; fed in
    // TWO micro-batches so the state-store serialize/merge path (the MG
    // combine rule as cross-batch accumulation) actually runs
    def pageRows(lo: Int, hi: Int) = (lo until hi).map { i =>
      (s"https://s.example/p/$i",
        new java.sql.Timestamp(t0 + i * 60000L),
        (0 until 12).map(j => s"tok${(i * 5 + j) % 40}").mkString(" "))
    }
    val mem = MemoryStream[(String, java.sql.Timestamp, String)]
    val q = PageStream.vocabHeavyHitters(
        mem.toDF().toDF("url", "warc_ts", "text"), capacity = 64)
      .writeStream.format("memory").queryName("vocabhh")
      .outputMode("complete").start()
    mem.addData(pageRows(0, 60))
    q.processAllAvailable()
    mem.addData(pageRows(60, 120))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vocabhh")
      .orderBy("win_start", "token").collect()
    val batch = PageStream.vocabHeavyHitters(
        pageRows(0, 120).toDF("url", "warc_ts", "text"), capacity = 64)
      .orderBy("win_start", "token").collect()
    assert(streamed.sameElements(batch))
    // 120 minutes starting mid-hour → 3 hourly windows × 40 tokens
    assert(streamed.length == 120, s"${streamed.length}")
    // and the counts are the exact per-window token counts
    val exact = pageRows(0, 120).flatMap { case (_, ts, text) =>
      text.split(" ").map(tok => ((ts.getTime / 3600000L) * 3600000L, tok))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    streamed.foreach { r =>
      val key = (r.getTimestamp(0).getTime, r.getString(1))
      assert(exact(key) == r.getLong(2), s"$key")
    }
  }

  test("streaming vocab heavy hitters in append mode: windows finalize " +
      "past the watermark with the batch counts") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L // 22:06:40 UTC — mid-hour
    def rows(lo: Int, hi: Int) = (lo until hi).map { i =>
      (s"https://s.example/p/$i",
        new java.sql.Timestamp(t0 + i * 60000L),
        (0 until 6).map(j => s"w${(i * 3 + j) % 20}").mkString(" "))
    }
    val mem = MemoryStream[(String, java.sql.Timestamp, String)]
    val q = PageStream.vocabHeavyHitters(
        mem.toDF().toDF("url", "warc_ts", "text"),
        capacity = 64, watermark = "30 minutes")
      .writeStream.format("memory").queryName("vocabhh_app")
      .outputMode("append").start()
    // batch 1 fills the first (partial) 22:xx window; batch 2 jumps 4
    // hours ahead, dragging the watermark far past 23:00 so the first
    // TWO windows finalize and emit
    mem.addData(rows(0, 100))
    q.processAllAvailable()
    mem.addData(Seq(("https://s.example/late",
      new java.sql.Timestamp(t0 + 4 * 3600000L), "w0 w1")))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("vocabhh_app")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2)))
    val wins = emitted.map(_._1).distinct.sorted
    assert(wins.length == 2, s"${wins.length} finalized windows")
    // finalized counts equal the batch computation over the same rows
    val batch = PageStream.vocabHeavyHitters(
        rows(0, 100).toDF("url", "warc_ts", "text"), capacity = 64)
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2)))
      .filter(e => wins.contains(e._1))
    assert(emitted.sorted.toSeq == batch.sorted.toSeq)
  }

  test("streaming model-score gate equals the batch scorer per page") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = 1700000000000L
    val pages = (1 to 60).map { i =>
      (s"https://qs/$i", new java.sql.Timestamp(t0 + i * 1000L),
        if (i % 7 == 0) "" else s"tok${i % 9} tok${i % 5} shared word")
    }
    val w = spark.range(256).select(col("id").as("bucket"),
      (col("id") % 11).cast("double").as("weight"))
    val mem = MemoryStream[(String, java.sql.Timestamp, String)]
    mem.addData(pages.take(30))
    val q = PageStream.scoreStream(
        mem.toDF().toDF("url", "warc_ts", "text"), w, dim = 256, bias = 0.5)
      .writeStream.format("memory").queryName("qscore")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(pages.drop(30))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qscore").orderBy("url").collect()
    val batch = PageStream.scoreStream(
        pages.toDF("url", "warc_ts", "text"), w, dim = 256, bias = 0.5)
      .orderBy("url").collect()
    assert(streamed.sameElements(batch) && streamed.length == 60)
    // empty pages are scored at the bias, not dropped
    val empties = spark.table("qscore")
      .filter(col("url").isin((7 to 60 by 7).map(i => s"https://qs/$i"): _*))
      .select("score").collect().map(_.getDouble(0))
    assert(empties.length == 8 && empties.forall(_ == 0.5))
    // cross-operator parity: the streaming gate must score exactly as
    // the batch Curation scorer (shared tokenBucket + rounding)
    val viaCuration = graft.pipeline.Curation.hashedLinearScore(
        pages.zipWithIndex.map { case ((_, _, t), i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        w, dim = 256, bias = 0.5)
      .orderBy("id").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val viaStream = spark.table("qscore")
      .withColumn("n", regexp_extract(col("url"), "(\\d+)$", 1)
        .cast("long") - 1)
      .orderBy("n").select("score", "prob")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(viaStream.sameElements(viaCuration))
  }

  test("streaming PIP join equals batch on both physical paths") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val pages = (1 to 200).map(i => (s"https://pip/$i", s"body $i"))
    // two static boxes covering part of the geocode range [0, 180)^2
    val polys = Seq(
      (10L, graft.core.Wkb.writePolygon(
        Array((0.0, 0.0), (90.0, 0.0), (90.0, 90.0), (0.0, 90.0)))),
      (20L, graft.core.Wkb.writePolygon(
        Array((90.0, 90.0), (180.0, 90.0), (180.0, 180.0), (90.0, 180.0))))
    ).toDF("pid", "geom")
    val batch = graft.pipeline.SpatialJoin.pip(
        graft.pipeline.Webtext.geocode(pages.toDF("url", "text")), polys,
        graft.pipeline.SynthGeo.CellW)
      .as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    for ((name, limit, salt) <- Seq(("bcast", Long.MaxValue, 1),
        ("salted", 0L, 4))) {
      val mem = MemoryStream[(String, String)]
      mem.addData(pages.take(120))
      val q = PageStream.pipStream(mem.toDF().toDF("url", "text"), polys,
          broadcastLimitBytes = limit, nSalt = salt)
        .writeStream.format("memory").queryName(s"pip_$name")
        .outputMode("append").start()
      q.processAllAvailable()
      mem.addData(pages.drop(120)) // second micro-batch
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(s"pip_$name")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"path $name")
    }
  }

  test("streaming simhash dedup: first wins, duplicates tagged across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mem = MemoryStream[PageStream.Page]
    val q = PageStream.simhashDedup(mem.toDS())
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    mem.addData(PageStream.Page("u1", body), PageStream.Page("u2", "other things entirely"))
    q.processAllAvailable()
    // second batch: an exact dup of u1's text arrives later
    mem.addData(PageStream.Page("u3", body))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedupstream")
      .collect().map(r => (r.getString(0), r.getBoolean(2), r.getString(3)))
      .toSet
    assert(out.contains(("u1", false, "u1")))
    assert(out.contains(("u2", false, "u2")))
    assert(out.contains(("u3", true, "u1"))) // cross-batch state hit
  }
}
