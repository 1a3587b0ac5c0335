package graft

import graft.pipeline.{SpatialJoin, Webtext}
import graft.stats.Lisa
import graft.weights.KnnWeights
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-evidence job (BASELINE.md methodology): the identical
  * north-rule pipeline — synth webpages → geocode → tile → PIP spatial
  * join → kNN weights → local Moran(999, seed 123456789) — run on the
  * identical input at two parallelism levels (run with
  * SPARK_GRAFT_CPUS=8 then =32); report rows/s at both and
  * eff = (rate_32 / rate_8) / 4, gate ≥ 0.8.
  *
  * Env: SPARK_GRAFT_PIPE_N synthetic page count (default 2,000,000);
  * SPARK_GRAFT_PIPE_METHOD permutation method for the Moran stage —
  * "complete" (default; bit-reproducible parity mode) or "lookup"
  * (the reference's own default and the perf path).
  */
object PipeBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PIPE_N", "2000000").toLong
    val method = sys.env.getOrElse("SPARK_GRAFT_PIPE_METHOD", "complete")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // deterministic synthetic web pages (url + text payload)
      val pages = spark.range(n).select(
          concat(lit("https://site-"), (col("id") % 9973).cast("string"),
            lit(".example/page/"), col("id").cast("string")).as("url"),
          concat(lit("content "),
            (col("id") % 1000).cast("string")).as("text"))
        .cache()
      pages.count() // materialize input outside timing

      // synthetic admin polygon layer: 100x100 grid over the geocode
      // domain [0,180)^2
      import spark.implicits._
      val gridW = 100
      val cellW = 1.8
      val polys = spark.range(gridW.toLong * gridW).as[Long].map { id =>
        val cx = (id % gridW).toDouble
        val cy = (id / gridW).toDouble
        (id, graft.core.Wkb.writePolygon(Array(
          (cx * cellW, cy * cellW), ((cx + 1) * cellW, cy * cellW),
          ((cx + 1) * cellW, (cy + 1) * cellW), (cx * cellW, (cy + 1) * cellW))))
      }.toDF("pid", "geom").cache()
      polys.count()

      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }

      val tTotal0 = System.nanoTime()
      val (geo, tGeo) = time {
        val g = Webtext.geocode(pages).cache(); g.count(); g
      }
      val (joinRows, tJoin) = time {
        SpatialJoin.pip(geo, polys, cellW).count()
      }
      val k = 10
      val cell = 180.0 / math.sqrt(n.toDouble / k)
      val (w, tKnn) = time {
        val wdf = KnnWeights.build(geo.select("gid", "x", "y"),
          KnnWeights.Conf(k = k, cellSize = Some(cell))).cache()
        wdf.count(); wdf
      }
      val (_, tMoran) = time {
        val vals = geo.select(col("gid"),
          length(col("text")).cast("double").as("value"))
        Lisa.localMoran(vals, w, Lisa.Conf(permMethod = method))
          .agg(sum("stat")).head()
      }
      val total = (System.nanoTime() - tTotal0) / 1e9
      val rate = math.round(n / total)
      println(s"""{"metric":"pipe_scaling","n":$n,"cpus":"$cpus","method":"$method","unit":"sec","geocode_sec":$tGeo,"join_sec":$tJoin,"join_rows":$joinRows,"knn10_sec":$tKnn,"moran_sec":$tMoran,"total_sec":$total,"pages_per_sec":$rate}""")
    } finally spark.stop()
  }
}
