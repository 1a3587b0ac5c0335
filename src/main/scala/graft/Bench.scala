package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round benchmark: every SparkEntry query, plus the north-rule
  * headline pipeline (webpages → geocode → tile → PIP join → kNN weights
  * → local Moran 999 perms) timed end-to-end with its rows/s.
  *
  * Every timing is the MEDIAN of `SPARK_GRAFT_RUNS` (default 3)
  * back-to-back runs, with the per-query minimum also reported — the
  * sandbox host shows 2-10× single-run wall swings (BENCH.md), so
  * single-sample numbers cannot distinguish a regression from noise.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  * SPARK_GRAFT_RUNS (default 3). Prints ONE JSON line.
  */
object Bench {

  /** Cumulative per-query repeat budget (seconds) — shared by the
    * single-query `timed` helper and the interleaved suite sweeps so
    * the two repeat policies cannot desynchronize.
    */
  private val RepeatBudgetSec = 45.0

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** Time `body` up to `runs` times; (median, min) seconds over the
    * SUCCESSFUL runs only — a transient failure must not publish a
    * negative min/median next to otherwise-good repeats. Only when every
    * run fails do both stats report -1 (the explicit all-failed marker).
    * Repeats stop once `repeatBudgetSec` of cumulative time is spent —
    * re-running a 60-second driver-side solve three times triples the
    * suite wall without fixing anything (the host's contention windows
    * persist for minutes, longer than any back-to-back repeat), while
    * the sub-second queries that r02's noise actually corrupted always
    * get their full median.
    */
  private def timed(runs: Int, repeatBudgetSec: Double = RepeatBudgetSec)
                   (body: => Unit): (Double, Double) = {
    val ok = scala.collection.mutable.ArrayBuffer.empty[Double]
    var failures = 0
    var spent = 0.0
    var i = 0
    while (i < runs && (i == 0 || spent < repeatBudgetSec)) {
      val t0 = System.nanoTime()
      try { body; ok += (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => failures += 1 }
      spent += (System.nanoTime() - t0) / 1e9
      i += 1
    }
    if (failures > 0)
      System.err.println(s"[bench] WARN: $failures/${ok.length + failures} " +
        "runs failed")
    if (ok.isEmpty) (-1.0, -1.0) else (median(ok.toSeq), ok.min)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
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

    // SPARK_GRAFT_ONLY=q13,q27 → time only the named query prefixes
    // (A/B debugging); unset = the full suite (driver mode)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) =>
        ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // INTERLEAVED sweeps: run the whole suite once per sweep and take
    // per-query medians ACROSS sweeps, instead of back-to-back repeats
    // per query. The host's contention windows persist for minutes —
    // longer than any back-to-back repeat — so under per-query repeats a
    // single window corrupts every sample of whichever query it lands on
    // (that fabricated both r04 outliers, q57/q62); under sweeps it
    // touches at most one sample of each query and the median discards
    // it. The 45 s per-query budget still stops re-running long
    // driver-side solves: a query whose cumulative time exceeds it keeps
    // its first sample and is skipped in later sweeps.
    val ordered = selected.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.LinkedHashMap(
      ordered.map { case (n, _) => n ->
        scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    val spentByQuery = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(0.0)
    val failsByQuery = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    for (sweep <- 1 to runs; (name, fn) <- ordered) {
      if (sweep == 1 || spentByQuery(name) < RepeatBudgetSec) {
        val t0 = System.nanoTime()
        // NonFatal only: an OOM/interrupt means the JVM is corrupted —
        // recording it as a query failure and sweeping on would pollute
        // every later sample; let fatal errors abort the bench run.
        // Consume via the query's OWN physical plan (internal-row RDD
        // count): a DataFrame.count() lets Catalyst prune projections
        // and drop sorts, so projection-final queries (token counts,
        // quality signals, PII scrub, the rate family's arithmetic)
        // were partially timed as scan-only counts — the same voided
        // class the r7 TextBench audit found. toRdd executes the plan
        // as the query declared it, every column computed, with no
        // extra row serialization.
        try {
          org.apache.spark.sql.graftshim.ColumnShim
            .toInternalRdd(fn(spark, sfDir)).count()
          samples(name) += (System.nanoTime() - t0) / 1e9
        }
        catch { case scala.util.control.NonFatal(_) => failsByQuery(name) += 1 }
        spentByQuery(name) += (System.nanoTime() - t0) / 1e9
      }
    }
    failsByQuery.foreach { case (n, f) =>
      System.err.println(s"[bench] WARN: $n: $f/${samples(n).length + f} " +
        "runs failed")
    }
    val results = samples.map { case (name, xs) =>
      name -> (if (xs.isEmpty) (-1.0, -1.0) else (median(xs.toSeq), xs.min))
    }
    val qs = results.map { case (k, (med, _)) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, (_, mn)) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val total = results.values.map(_._1).sum

    if (only.isDefined) {
      // focused A/B run: skip the pipeline/Moran headline sections
      println(s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"queries":$qs,"queries_min":$qsMin,"sf":"$sfDir","cpus":"$cpus"}""")
      spark.stop()
      return
    }

    // north-rule headline: full webtext pipeline (no checkpoint IO),
    // rebuilt from scratch each run (fresh caches) so the median times
    // the whole build, not a cache hit
    val pages = graft.pipeline.Webtext.synthWebpages(spark, sfDir).cache()
    val nPages = pages.count()
    val polys = graft.pipeline.SynthGeo.partPolygons(spark, sfDir)
      .withColumnRenamed("gid", "pid")
    var joinedRows = 0L
    val pipeRuns = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val geo = graft.pipeline.Webtext.geocode(pages).cache()
      geo.count()
      val joined = graft.pipeline.SpatialJoin.pip(geo, polys,
        graft.pipeline.SynthGeo.CellW)
      joinedRows = joined.count()
      val w = graft.weights.KnnWeights.build(geo.select("gid", "x", "y"),
        graft.weights.KnnWeights.Conf(k = 4,
          cellSize = Some(graft.pipeline.SynthGeo.CellW)))
      val vals = geo.select(col("gid"),
        length(col("text")).cast("double").as("value"))
      graft.stats.Lisa.localMoran(vals, w).agg(sum("stat")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      geo.unpersist(blocking = false)
      sec
    }
    val pipeSec = median(pipeRuns)
    val pipeRate = math.round(nPages / pipeSec)

    // Moran alone, both permutation methods, over a prebuilt cached
    // weights frame (pure kernel timing): 'complete' is the bit-parity
    // default, 'lookup' is the reference's own default and the perf mode
    val geo = graft.pipeline.Webtext.geocode(pages).cache()
    geo.count()
    val w = graft.weights.KnnWeights.build(geo.select("gid", "x", "y"),
      graft.weights.KnnWeights.Conf(k = 4,
        cellSize = Some(graft.pipeline.SynthGeo.CellW))).cache()
    w.count()
    val vals = geo.select(col("gid"),
      length(col("text")).cast("double").as("value"))
    val (moranCompleteSec, moranCompleteMin) = timed(runs) {
      graft.stats.Lisa.localMoran(vals, w).agg(sum("stat")).head(): Unit
    }
    val (moranLookupSec, moranLookupMin) = timed(runs) {
      graft.stats.Lisa.localMoran(vals, w,
        graft.stats.Lisa.Conf(permMethod = "lookup"))
        .agg(sum("stat")).head(): Unit
    }

    println(s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"queries":$qs,"queries_min":$qsMin,"sf":"$sfDir","pipeline_sec":$pipeSec,"pipeline_runs":[${pipeRuns.mkString(",")}],"pipeline_pages":$nPages,"pipeline_join_rows":$joinedRows,"pipeline_pages_per_sec":$pipeRate,"moran_complete_sec":$moranCompleteSec,"moran_complete_min":$moranCompleteMin,"moran_lookup_sec":$moranLookupSec,"moran_lookup_min":$moranLookupMin,"cpus":"$cpus"}""")
    spark.stop()
  }
}
