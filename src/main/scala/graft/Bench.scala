package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: every SparkEntry query, plus the north-rule
  * headline pipeline (webpages → geocode → tile → PIP join → kNN weights
  * → local Moran 999 perms) timed end-to-end with its rows/s.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4).
  * Prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the session-shared weights cache + parquet footers so
    // per-query timings are stage-attributable (the first LISA query
    // otherwise pays the whole kNN weights materialization)
    try SparkEntry.queries("q14_spatial_lag")(spark, sfDir).count()
    catch { case _: Throwable => }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // north-rule headline: full webtext pipeline (no checkpoint IO)
    val pages = graft.pipeline.Webtext.synthWebpages(spark, sfDir).cache()
    val nPages = pages.count()
    val t0 = System.nanoTime()
    val geo = graft.pipeline.Webtext.geocode(pages).cache()
    geo.count()
    val polys = graft.pipeline.SynthGeo.partPolygons(spark, sfDir)
      .withColumnRenamed("gid", "pid")
    val joined = graft.pipeline.SpatialJoin.pip(geo, polys,
      graft.pipeline.SynthGeo.CellW)
    val joinedRows = joined.count()
    val w = graft.weights.KnnWeights.build(geo.select("gid", "x", "y"),
      graft.weights.KnnWeights.Conf(k = 4,
        cellSize = Some(graft.pipeline.SynthGeo.CellW))).cache()
    w.count()
    val vals = geo.select(col("gid"), length(col("text")).cast("double").as("value"))
    graft.stats.Lisa.localMoran(vals, w).agg(sum("stat")).head()
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val pipeRate = math.round(nPages / pipeSec)

    // Moran alone, both permutation methods (weights cached → pure
    // kernel): 'complete' is the bit-parity default, 'lookup' is the
    // reference's own default and the perf mode
    val tM0 = System.nanoTime()
    graft.stats.Lisa.localMoran(vals, w).agg(sum("stat")).head()
    val moranCompleteSec = (System.nanoTime() - tM0) / 1e9
    val tM1 = System.nanoTime()
    graft.stats.Lisa.localMoran(vals, w,
      graft.stats.Lisa.Conf(permMethod = "lookup")).agg(sum("stat")).head()
    val moranLookupSec = (System.nanoTime() - tM1) / 1e9

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_sec":$pipeSec,"pipeline_pages":$nPages,"pipeline_join_rows":$joinedRows,"pipeline_pages_per_sec":$pipeRate,"moran_complete_sec":$moranCompleteSec,"moran_lookup_sec":$moranLookupSec,"cpus":"$cpus"}""")
    spark.stop()
  }
}
