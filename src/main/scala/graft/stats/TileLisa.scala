package graft.stats

import graft.core.{Stat0, Tiling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-tile LISA — the 10^12-row execution mode (SURVEY §7.5 option i).
  *
  * Broadcast-mode LISA needs the full z-vector on every executor, which
  * caps out around ~10^8 rows. Beyond that the engine partitions space
  * into super-tiles and runs the statistic independently per tile with
  * the reference's own window-trim semantics (`binweight.cpp:128-207`,
  * SURVEY §1.4): LISA over a sub-window DROPS neighbors outside the
  * window, RENUMBERS observations to window positions 0..N-1, and
  * standardizes over the window — so per-tile output is reference-defined
  * behavior (each tile IS a window), not an approximation of the global
  * statistic.
  *
  * Shape: one shuffle keyed by tile; within each tile group the same
  * LisaKernels run as in broadcast mode. Tiles are independent → no
  * broadcast, no global state, arbitrarily many tiles.
  */
object TileLisa {

  sealed trait Stat
  case object Moran extends Stat
  case object G extends Stat
  case object GStar extends Stat
  case object Geary extends Stat
  case object JoinCount extends Stat

  /** Per-tile LISA for any univariate statistic.
    * points:  (gid, x, y) — tile assignment source
    * values:  (gid, value)
    * weights: (gid, nbrs)
    * tileSize: super-tile edge length (in coordinate units).
    * Output: (gid, tile, stat, p, c).
    */
  def run(stat: Stat, points: DataFrame, values: DataFrame,
          weights: DataFrame, tileSize: Double,
          conf: Lisa.Conf = Lisa.Conf()): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val tiles = points.select(col("gid").cast("long"),
      Tiling.cellIdCol(col("x"), col("y"), tileSize).as("tile"))
    val joined = tiles
      .join(values.select(col("gid").cast("long"),
        col("value").cast("double")), Seq("gid"))
      .join(weights.select(col("gid").cast("long"), col("nbrs")), Seq("gid"))
      .select(col("tile"), col("gid"), col("value"), col("nbrs"))
      .as[(Long, Long, Double, Option[Seq[Long]])]

    val permutations = conf.permutations
    val seed = conf.seed
    val cutoff = conf.cutoff
    val permMethod = conf.permMethod
    val which = stat

    joined.groupByKey(_._1).flatMapGroups { (tile, it) =>
      // materialize the tile window, sorted by gid (window order)
      val rows = it.toArray.sortBy(_._2)
      val n = rows.length
      val gids = new Array[Long](n)
      val x = new Array[Double](n)
      var i = 0
      while (i < n) { gids(i) = rows(i)._2; x(i) = rows(i)._3; i += 1 }
      if (which == JoinCount) {
        // same 0/1 validation broadcast-mode Lisa.localJoinCount enforces
        i = 0
        while (i < n) {
          require(x(i) == 0.0 || x(i) == 1.0,
            s"tile join count variable must be binary 0/1 (joincount.c " +
              s"semantics); found ${x(i)} at gid ${gids(i)}")
          i += 1
        }
      }
      // window standardization / moments (reference: whole-window stats)
      val z = x.clone()
      Stat0.standardize(z)
      var sumAll = 0.0
      x.foreach(sumAll += _)
      // window-trim all rows first: drop neighbors not present in this
      // tile (binweight.cpp:153-183 semantics), remap to window
      // positions — and learn the window's max degree so 'lookup' mode
      // can size its shared draw table (per window, exactly as the
      // broadcast engine sizes it globally)
      val trimmed = rows.map { case (_, _, _, nbrOpt) =>
        nbrOpt.getOrElse(Seq.empty).iterator
          .map(nb => java.util.Arrays.binarySearch(gids, nb))
          .filter(_ >= 0).toArray
      }
      var maxK = 0
      trimmed.foreach(a => if (a.length > maxK) maxK = a.length)
      val lt =
        if (permMethod == "lookup" && maxK > 0 && maxK < n - 1)
          new LisaKernels.LookupTable(n, maxK, permutations, seed)
        else null // dense/tiny window: 'complete' fallback, as in runKernel
      val scratch = new LisaKernels.Scratch(n, 65536, lt)
      rows.iterator.zipWithIndex.map { case ((_, gid, _, _), idx) =>
        val nbrs = trimmed(idx)
        val t = which match {
          case Moran => LisaKernels.moran(idx, nbrs, z, permutations,
            seed, cutoff, scratch)
          case G => LisaKernels.localG(idx, nbrs, x, sumAll, permutations,
            seed, cutoff, scratch)
          case GStar => LisaKernels.localGStar(idx, nbrs, x, sumAll,
            permutations, seed, cutoff, scratch)
          case Geary => LisaKernels.geary(idx, nbrs, z, permutations,
            seed, cutoff, scratch)
          case JoinCount => LisaKernels.joinCount(idx, nbrs, x,
            permutations, seed, scratch)
        }
        (gid, tile, t.stat, t.p, t.c)
      }
    }.toDF("gid", "tile", "stat", "p", "c")
  }

  /** Local Moran per tile (back-compat entry point). */
  def localMoran(points: DataFrame, values: DataFrame, weights: DataFrame,
                 tileSize: Double, conf: Lisa.Conf = Lisa.Conf()): DataFrame =
    run(Moran, points, values, weights, tileSize, conf)
}
